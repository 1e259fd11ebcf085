"""MLDetector: deep-learning primary detector over max-stacked windows.

Parity with reference MLDetector (MetLib/Detector.py:522-573): the detector
max-stacks the sliding window of color frames and runs the YOLO model on the
stack, then orients each box's diagonal via the Sobel gradient direction of
its ROI.

TPU-native: the window max comes from the batched rolling max (ops.windows);
per-block the stacks are computed in one device pass and the YOLO forwards
are batched.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..log import BaseMetLog
from ..models import init_model
from ..ops import windows
from ..structs import Box, DLCfg
from ..track.features import calc_roi_gradient
from ..utils import expand_cls_pred
from .base import BaseDetector, FrameResult


@functools.partial(jax.jit, static_argnames=("n",))
def _window_max_color(hist, frames, n):
    """Rolling max over [T, H, W, C] with [n-1, H, W, C] history."""
    seq = jnp.concatenate([hist, frames], axis=0)
    dims = (n, 1, 1, 1)
    out = jax.lax.reduce_window(seq, jnp.uint8(0), jax.lax.max, dims,
                                (1, 1, 1, 1), [(0, 0)] * 4)
    return out, seq[frames.shape[0]:]


class MLDetector(BaseDetector):

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg: DLCfg, logger: BaseMetLog) -> None:
        self.mask = mask
        self.num_cls = num_cls
        self.logger = logger
        self.n = max(int(window_sec * fps), 1)
        h, w = mask.shape[:2]
        c = mask.shape[2] if mask.ndim == 3 else 3
        self._hist_shape = (self.n - 1, h, w, c)
        self._hist = jnp.zeros(self._hist_shape, dtype=jnp.uint8)
        self.model = init_model(cfg.model, logger=self.logger)
        self._pending: list[np.ndarray] = []
        self._last: Optional[FrameResult] = None
        self.result_pos = np.zeros((0, 4), int)

    def update(self, new_frame: np.ndarray) -> None:
        self._pending.append(np.asarray(new_frame, dtype=np.uint8))

    def detect(self) -> FrameResult:
        if self._pending:
            block = np.stack(self._pending)
            self._pending.clear()
            self._last = self.process_block(block)[-1]
        if self._last is None:
            return np.zeros((0, 4), int), np.zeros((0, self.num_cls))
        return self._last

    def reset_device_state(self) -> None:
        """Device-fault recovery (api.py block loop): drop the possibly
        poisoned device-side window history; it re-warms over the next
        n-1 frames."""
        self._hist = jnp.zeros(self._hist_shape, dtype=jnp.uint8)

    def process_block_async(self, block) -> tuple:
        """Dispatch one block's window-max + every YOLO pyramid level as
        fused device programs (async; the history carry updates
        immediately, so blocks can pipeline). ``block`` may be a host
        array or an already-uploaded device array (loader device_put
        mode). Raises NotImplementedError when the model can't run
        device-resident (nms=False) — the caller falls back to
        process_block."""
        if not (getattr(self.model, "nms", False)
                and hasattr(self.model, "dispatch_batch_device")):
            raise NotImplementedError
        stacks_dev, self._hist = _window_max_color(self._hist,
                                                   jnp.asarray(block), self.n)
        return stacks_dev, self.model.dispatch_batch_device(stacks_dev)

    def collect(self, handle: tuple) -> list[FrameResult]:
        stacks_dev, model_handle = handle
        return self._orient_results(
            stacks_dev, self.model.collect_batch_device(model_handle))

    # the deferred-collection horizon keeps every handle's window-max
    # stacks alive on device ([T, H, W, 3] each, ~100 MB per 64-frame
    # 540p color block) until the flush -- bound the backlog well under
    # HBM (api._run_block_loop clamps its horizon to this)
    max_deferred_horizon = 16

    def collect_many(self, handles: list) -> list[list[FrameResult]]:
        """Deferred-collection primitive (api._run_block_loop): stack
        each pyramid level's compacted candidates ACROSS the horizon's
        handles and fetch them as single arrays -- L*2 fetches per fixed
        GROUP of blocks instead of L per block (and zero fetches in the
        hot dispatch loop). The host postprocess then runs per block on
        the prefetched buffers through the model's normal collect path
        (np.asarray on a numpy array is a no-op).

        METDETPY_TPU_NO_FETCH=1: compile-only warmup -- ready the
        stacked arrays, fetch nothing, return empty results."""
        import os
        if not handles:
            return []
        group = max(1, int(os.environ.get("METDETPY_TPU_COLLECT_GROUP",
                                          8)))
        no_fetch = bool(os.environ.get("METDETPY_TPU_NO_FETCH"))
        n_levels = len(handles[0][1][6])
        # fetched[i] = per-handle list of (sel, n_above) numpy pairs
        fetched: list[list] = [[] for _ in handles]
        for a in range(0, len(handles), group):
            grp = handles[a:a + group]
            k = len(grp)
            while len(grp) < group:
                grp.append(grp[0])  # pad: dropped after fetch
            for lv in range(n_levels):
                sel = jnp.stack([h[1][6][lv][1] for h in grp])
                n_above = jnp.stack([jnp.asarray(h[1][6][lv][2])
                                     for h in grp])
                if no_fetch:
                    jax.block_until_ready((sel, n_above))
                    continue
                sel_np = np.asarray(sel)
                na_np = np.asarray(n_above)
                for i in range(k):
                    fetched[a + i].append((sel_np[i], na_np[i]))
        if no_fetch:
            b = handles[0][1][1]
            empty = [(np.zeros((0, 4), int),
                      np.zeros((0, self.num_cls)))] * b
            return [list(empty) for _ in handles]
        out = []
        for i, (stacks_dev, mh) in enumerate(handles):
            single_scale, b, h, w, tflag, k_budget, outs = mh
            outs_np = [(outs[lv][0], fetched[i][lv][0], fetched[i][lv][1])
                       for lv in range(n_levels)]
            out.append(self._orient_results(
                stacks_dev, self.model.collect_batch_device(
                    (single_scale, b, h, w, tflag, k_budget, outs_np))))
        return out

    def process_block(self, block: np.ndarray) -> list[FrameResult]:
        try:
            return self.collect(self.process_block_async(block))
        except NotImplementedError:
            pass
        stacks_dev, self._hist = _window_max_color(self._hist,
                                                   jnp.asarray(block), self.n)
        # device-resident forwards: the [T, H, W, 3] stacks are never read
        # back to host -- only compacted candidates cross the link (vs the
        # reference's host-fetched stacks + one onnxruntime call per tile)
        if hasattr(self.model, "forward_batch_device"):
            batch_out = self.model.forward_batch_device(stacks_dev)
        else:
            batch_out = self.model.forward_batch(np.asarray(stacks_dev))
        return self._orient_results(stacks_dev, batch_out)

    def _orient_results(self, stacks_dev,
                        batch_out: list) -> list[FrameResult]:
        results: list[FrameResult] = []
        for t, (pos, cls) in enumerate(batch_out):
            if len(pos) == 0:
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            # orient the box diagonal along the dominant gradient direction
            # (reference MetLib/Detector.py:549-554); detections are rare,
            # so fetch only each detection's ROI from the device stacks
            # (same clamp semantics as crop_with_box: plain slicing)
            for i, coords in enumerate(pos):
                box = Box.from_list(list(coords))
                roi_dev = stacks_dev[t, box.y1:box.y2, box.x1:box.x2]
                if roi_dev.size == 0:
                    continue
                drct = calc_roi_gradient(np.asarray(roi_dev))
                if not np.isnan(drct) and int(drct // (np.pi / 2)) % 2 == 1:
                    pos[i, [1, 3]] = pos[i, [3, 1]]
            self.result_pos = pos
            results.append((pos, expand_cls_pred(cls)))
        return results

    def visu(self):
        from ..visu import DrawRectVisu, SquareColorPair
        return [DrawRectVisu("results", color="orange", pair_list=[
            SquareColorPair(dot_pair=([int(x[0]), int(x[1])],
                                      [int(x[2]), int(x[3])]))
            for x in self.result_pos])]
