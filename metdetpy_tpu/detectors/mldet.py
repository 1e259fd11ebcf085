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


_ROI_WIN = 256          # static ROI window side (boxes larger fall back)
_ROI_BUCKETS = (4, 16, 64)   # padded batch sizes (bounds compile count)

# device-orientation limits: rows beyond _ORIENT_CAP or ROIs larger than
# _ORIENT_WIN fall back to the host ROI-fetch path (the weight-percentile
# needs a [cap, win*win] sort, so both are kept small; meteors at 320-px
# analysis are tens of px and a 64-frame block rarely keeps >64 boxes)
_ORIENT_CAP = 64
_ORIENT_WIN = 96


def _reflect101(n, length):
    """OpenCV BORDER_REFLECT_101 index fold (vectorized, clamped so any
    off-range probe stays in-bounds; off-range only happens for masked
    outputs)."""
    n = jnp.abs(n)
    n = jnp.where(n >= length, 2 * length - 2 - n, n)
    return jnp.clip(n, 0, length - 1)


@functools.partial(jax.jit, static_argnames=("p",))
def _orient_from_packed(stacks, packed, sw, sh, p: int):
    """Device Sobel circular-mean orientation for the compacted kept rows.

    Mirrors track.features.calc_roi_gradient (reference
    MetLib/feature.py:17-34) per row of the model's packed readback
    (owner, x1, y1, x2, y2, obj, cls...) at model scale:
      * box -> frame scale (*sw/*sh), trunc-to-int, python-slice clamp
        semantics (exactly what the host _orient_results does),
      * gray conversion with cv2's fixed-point weights,
      * 3x3 Sobel with BORDER_REFLECT_101 folded at the ROI's own edges,
      * weight = hypot(gx, gy), thresholded at the ROI's 95th percentile
        (np.percentile linear interpolation, computed via a full sort),
      * weighted circular sums.

    Returns [cap, 4] f32: (sum w*sin(2a)... no -- (sc, cc, wtot, ok)
    where sc/cc are the weighted circular sums of angle = atan2(-gy, gx)
    mod pi, wtot the weight total, and ok=0 flags rows this kernel could
    not handle (ROI larger than ``p``) -- the host falls back to the
    fetched-ROI path for those. Host-side drct = atan2(sc, cc) % 2pi.

    Numerics: gx/gy and their squares are integer-exact in f32; the
    percentile cut and the circular sums run in f32 (the host reference
    is f64), so angles can differ by ~1e-5 rad -- the consumer only uses
    the quadrant of the angle, so this path is behavior-equivalent
    though not bit-equal (tests pin a tolerance + quadrant agreement).
    """
    t_n, h, w, _ = stacks.shape
    cap = packed.shape[0]

    def one(row):
        t = jnp.clip(row[0].astype(jnp.int32), 0, t_n - 1)
        bx = row[1:5] * jnp.stack([sw, sh, sw, sh])
        bi = bx.astype(jnp.int32)     # trunc cast, same as np .astype(int)
        x1, y1, x2, y2 = bi[0], bi[1], bi[2], bi[3]
        # python slice(start, stop).indices(length) semantics
        def clampidx(v, length):
            return jnp.where(v < 0, jnp.maximum(length + v, 0),
                             jnp.minimum(v, length))
        y1c, y2c = clampidx(y1, h), clampidx(y2, h)
        x1c, x2c = clampidx(x1, w), clampidx(x2, w)
        bh = jnp.maximum(y2c - y1c, 0)
        bw = jnp.maximum(x2c - x1c, 0)
        ok = (bh <= p) & (bw <= p)
        empty = (bh == 0) | (bw == 0)
        # gather a [p, p] window that contains the valid ROI
        y0 = jnp.clip(jnp.minimum(y1c, h - p), 0, h - p)
        x0 = jnp.clip(jnp.minimum(x1c, w - p), 0, w - p)
        win = jax.lax.dynamic_slice(stacks, (t, y0, x0, jnp.int32(0)),
                                    (1, p, p, 3))[0].astype(jnp.int32)
        gray = (win[..., 0] * 3735 + win[..., 1] * 19235
                + win[..., 2] * 9798 + 16384) >> 15
        vy, vx = y1c - y0, x1c - x0
        # reflect-101 padded ROI in det-local coords: [p+2, p+2]
        ar = jnp.arange(-1, p + 1)
        safe_bh = jnp.maximum(bh, 1)
        safe_bw = jnp.maximum(bw, 1)
        rm = vy + _reflect101(ar, safe_bh)
        cm = vx + _reflect101(ar, safe_bw)
        padded = gray[rm[:, None], cm[None, :]]
        gx = ((padded[:-2, 2:] - padded[:-2, :-2])
              + 2 * (padded[1:-1, 2:] - padded[1:-1, :-2])
              + (padded[2:, 2:] - padded[2:, :-2]))
        gy = ((padded[2:, :-2] - padded[:-2, :-2])
              + 2 * (padded[2:, 1:-1] - padded[:-2, 1:-1])
              + (padded[2:, 2:] - padded[:-2, 2:]))
        gxf = gx.astype(jnp.float32)
        gyf = gy.astype(jnp.float32)
        angle = jnp.arctan2(-gyf, gxf) % jnp.float32(np.pi)
        weight = jnp.sqrt(gxf * gxf + gyf * gyf)
        ri = jnp.arange(p)
        valid = (ri[:, None] < bh) & (ri[None, :] < bw)
        # np.percentile(weight, 95) with linear interpolation over the
        # bh*bw valid values: ascending sort with invalids at +inf
        flat = jnp.where(valid.reshape(-1), weight.reshape(-1), jnp.inf)
        s = jnp.sort(flat)
        n_valid = jnp.maximum(bh * bw, 1)
        a = 0.95 * (n_valid - 1).astype(jnp.float32)
        lo = jnp.floor(a).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_valid - 1)
        cut = s[lo] + (a - lo.astype(jnp.float32)) * (s[hi] - s[lo])
        wt = jnp.where(valid & (weight > cut), weight, 0.0)
        sc = jnp.sum(wt * jnp.sin(angle))
        cc = jnp.sum(wt * jnp.cos(angle))
        wtot = jnp.sum(wt)
        z = jnp.float32(0)
        return jnp.stack([jnp.where(empty, z, sc),
                          jnp.where(empty, z, cc),
                          jnp.where(empty, z, wtot),
                          (ok | empty).astype(jnp.float32)])

    return jax.vmap(one)(packed[:cap])


@functools.partial(jax.jit, static_argnames=("p",))
def _gather_gray_rois(stacks, ts, ys, xs, p):
    """Extract [N, p, p] windows at (t, y, x) origins from u8 [T, H, W, 3]
    BGR stacks and gray-convert on device with OpenCV's exact fixed-point
    weights ((B*3735 + G*19235 + R*9798 + 16384) >> 15) -- the host
    reads every detection's orientation ROI in ONE fetch instead of one
    RTT-bound fetch per detection (measured: the per-detection fetches
    were ~2.2 s of a 3.2 s dldet wall on the tunneled chip)."""
    def one(t, y, x):
        win = jax.lax.dynamic_slice(
            stacks, (t, y, x, jnp.int32(0)), (1, p, p, 3))[0]
        win = win.astype(jnp.int32)
        gray = (win[..., 0] * 3735 + win[..., 1] * 19235
                + win[..., 2] * 9798 + 16384) >> 15
        return gray.astype(jnp.uint8)
    return jax.vmap(one)(ts, ys, xs)


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
        # cumulative collect_many decomposition (api perf dict)
        self.last_collect_stats: dict = {}

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
        mh = self.model.dispatch_batch_device(stacks_dev)
        orient_dev = None
        if mh[0] == "compact":
            # chain the ROI orientation on the packed kept rows so the
            # angles ride the same deferred readback (zero extra
            # host<->device round trips for in-cap, in-window boxes)
            (_, packed, _, _, _), = mh[6]
            h, w = int(stacks_dev.shape[1]), int(stacks_dev.shape[2])
            p = int(min(_ORIENT_WIN, h, w))
            orient_dev = _orient_from_packed(
                stacks_dev, packed[:_ORIENT_CAP],
                jnp.float32(w / self.model.w),
                jnp.float32(h / self.model.h), p)
        return stacks_dev, mh, orient_dev

    def collect(self, handle: tuple) -> list[FrameResult]:
        stacks_dev, model_handle, orient_dev = handle
        batch_out = self.model.collect_batch_device(model_handle)
        return self._orient_results(
            stacks_dev, batch_out,
            orient=(None if orient_dev is None
                    else np.asarray(orient_dev)),
            rowidx=getattr(self.model, "_last_compact_rowidx", None))

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
        # don't pad a short horizon up to the full group (padding rows
        # are fetched too -- a 2-handle horizon padded to 8 reads 4x the
        # bytes); round up to the nearest power-of-two bucket instead,
        # which keeps the stacked-fetch compile count bounded
        while group // 2 >= len(handles):
            group //= 2
        import time
        no_fetch = bool(os.environ.get("METDETPY_TPU_NO_FETCH"))
        stats = {"fetch_s": 0.0, "post_s": 0.0, "orient_s": 0.0,
                 "fetch_bytes": 0}
        n_levels = len(handles[0][1][6])
        # arrays per level after the leading tiles entry: (sel, n_above)
        # for multiscale, (sel, n_above, order, keep) when the NMS ran
        # fused in the dispatch chain (models/yolo.py _sel_nms_device)
        n_slots = len(handles[0][1][6][0]) - 1
        # fetched[i] = per-handle list of per-level numpy tuples;
        # fetched_orient[i] = per-handle [cap, 4] orientation triples
        fetched: list[list] = [[] for _ in handles]
        fetched_orient: list = [None] * len(handles)
        for a in range(0, len(handles), group):
            grp = handles[a:a + group]
            k = len(grp)
            while len(grp) < group:
                grp.append(grp[0])  # pad: dropped after fetch
            for lv in range(n_levels):
                stacked = [jnp.stack([jnp.asarray(h[1][6][lv][s + 1])
                                      for h in grp])
                           for s in range(n_slots)]
                if no_fetch:
                    jax.block_until_ready(stacked)
                    continue
                tf = time.perf_counter()
                nps = [np.asarray(x) for x in stacked]
                stats["fetch_s"] += time.perf_counter() - tf
                stats["fetch_bytes"] += sum(x.nbytes for x in nps)
                for i in range(k):
                    fetched[a + i].append(tuple(x[i] for x in nps))
            if grp[0][2] is not None:
                ostack = jnp.stack([h[2] for h in grp])
                if no_fetch:
                    jax.block_until_ready(ostack)
                    continue
                tf = time.perf_counter()
                onp = np.asarray(ostack)
                stats["fetch_s"] += time.perf_counter() - tf
                stats["fetch_bytes"] += onp.nbytes
                for i in range(k):
                    fetched_orient[a + i] = onp[i]
        if no_fetch:
            b = handles[0][1][1]
            empty = [(np.zeros((0, 4), int),
                      np.zeros((0, self.num_cls)))] * b
            return [list(empty) for _ in handles]
        out = []
        for i, (stacks_dev, mh, _orient_dev) in enumerate(handles):
            single_scale, b, h, w, tflag, k_budget, outs = mh
            outs_np = [(outs[lv][0], *fetched[i][lv])
                       for lv in range(n_levels)]
            tp = time.perf_counter()
            batch_out = self.model.collect_batch_device(
                (single_scale, b, h, w, tflag, k_budget, outs_np))
            to = time.perf_counter()
            out.append(self._orient_results(
                stacks_dev, batch_out, orient=fetched_orient[i],
                rowidx=getattr(self.model, "_last_compact_rowidx", None)))
            te = time.perf_counter()
            stats["post_s"] += to - tp
            stats["orient_s"] += te - to
        for k2, v2 in stats.items():
            self.last_collect_stats[k2] = (
                self.last_collect_stats.get(k2, 0) + v2)
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

    def _fetch_gray_rois(self, stacks_dev, dets: list) -> list:
        """Batched orientation-ROI readback. ``dets`` holds
        (t, y1, y2, x1, x2) with raw (possibly negative / overshooting)
        box coords; each entry resolves with python plain-slice semantics
        -- exactly what ``stacks_dev[t, y1:y2, x1:x2]`` did -- then all
        in-window ROIs arrive as one [N, p, p] device gather + single
        d2h fetch (gray-converted on device, bit-equal to cv2's
        BGR2GRAY). Oversize ROIs (> _ROI_WIN) fall back to an individual
        fetch. Returns gray u8 arrays (size 0 when the slice is empty),
        one per det."""
        h, w = int(stacks_dev.shape[1]), int(stacks_dev.shape[2])
        p = int(min(_ROI_WIN, h, w))
        out: list = [None] * len(dets)
        pend: list = []   # (det_idx, oy, ox, bh, bw)
        ts: list = []
        ys: list = []
        xs: list = []
        for i, (t, y1, y2, x1, x2) in enumerate(dets):
            y1c, y2c, _ = slice(int(y1), int(y2)).indices(h)
            x1c, x2c, _ = slice(int(x1), int(x2)).indices(w)
            bh, bw = max(0, y2c - y1c), max(0, x2c - x1c)
            if bh == 0 or bw == 0:
                out[i] = np.zeros((bh, bw), np.uint8)
                continue
            if bh > p or bw > p:
                bgr = np.asarray(stacks_dev[t, y1c:y2c, x1c:x2c])
                b32 = bgr.astype(np.int32)
                out[i] = ((b32[..., 0] * 3735 + b32[..., 1] * 19235
                           + b32[..., 2] * 9798 + 16384) >> 15
                          ).astype(np.uint8)
                continue
            y0 = min(y1c, h - p)
            x0 = min(x1c, w - p)
            pend.append((i, y1c - y0, x1c - x0, bh, bw))
            ts.append(t)
            ys.append(y0)
            xs.append(x0)
        done = 0
        while done < len(pend):
            rest = len(pend) - done
            bucket = next((b for b in _ROI_BUCKETS if b >= rest),
                          _ROI_BUCKETS[-1])
            take = min(rest, bucket)
            tt, yy, xx = (ts[done:done + take], ys[done:done + take],
                          xs[done:done + take])
            while len(tt) < bucket:   # pad; extras dropped after fetch
                tt.append(tt[0])
                yy.append(yy[0])
                xx.append(xx[0])
            wins = np.asarray(_gather_gray_rois(
                stacks_dev, jnp.asarray(tt, jnp.int32),
                jnp.asarray(yy, jnp.int32), jnp.asarray(xx, jnp.int32), p))
            for (i, oy, ox, bh, bw), win in zip(pend[done:done + take],
                                                wins):
                out[i] = win[oy:oy + bh, ox:ox + bw]
            done += take
        return out

    def _orient_results(self, stacks_dev, batch_out: list, orient=None,
                        rowidx=None) -> list[FrameResult]:
        results: list[FrameResult] = []
        dets: list = []       # (t, y1, y2, x1, x2)
        owners: list = []     # (frame t, row i)
        drcts: list = []      # device-computed angle or None (host leg)
        use_dev = orient is not None and rowidx is not None
        for t, (pos, cls) in enumerate(batch_out):
            for i, coords in enumerate(pos):
                if use_dev:
                    r = int(rowidx[t][i])
                    if r < len(orient) and orient[r][3] > 0:
                        sc, cc, wtot, _ = orient[r]
                        drcts.append(
                            float(np.arctan2(sc, cc) % (2 * np.pi))
                            if wtot > 0 else float("nan"))
                        continue
                box = Box.from_list(list(coords))
                dets.append((t, box.y1, box.y2, box.x1, box.x2))
                owners.append((t, i))
                drcts.append(None)
        rois = self._fetch_gray_rois(stacks_dev, dets) if dets else []
        roi_iter = iter(rois)
        # orient each box diagonal along the dominant gradient direction
        # (reference MetLib/Detector.py:549-554); device-computed angles
        # (the compact path) resolved above, host-fetched ROIs here
        di = 0
        for t, (pos, cls) in enumerate(batch_out):
            for i in range(len(pos)):
                drct = drcts[di]
                di += 1
                if drct is None:
                    roi = next(roi_iter)
                    if roi.size == 0:
                        continue
                    drct = calc_roi_gradient(roi)
                if not np.isnan(drct) and int(drct // (np.pi / 2)) % 2 == 1:
                    pos[i, [1, 3]] = pos[i, [3, 1]]
        for t, (pos, cls) in enumerate(batch_out):
            if len(pos) == 0:
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            self.result_pos = pos
            results.append((pos, expand_cls_pred(cls)))
        return results

    def visu(self):
        from ..visu import DrawRectVisu, SquareColorPair
        return [DrawRectVisu("results", color="orange", pair_list=[
            SquareColorPair(dot_pair=([int(x[0]), int(x[1])],
                                      [int(x[2]), int(x[3])]))
            for x in self.result_pos])]
