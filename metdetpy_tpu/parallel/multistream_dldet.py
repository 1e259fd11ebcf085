"""Multi-stream dldet: S camera feeds, MLDetector each, sharded over a
device mesh.

The dldet complement of parallel/multistream.py (BASELINE config #5's
scale-out shape applied to the deep-learning detector): every stream's
rolling color window-max runs on its mesh shard via shard_map with a
per-stream device-resident history carry, and the YOLO forward consumes
the [S·T] stack batch sharded on the same axis (weights replicate under
jit; no collectives). Hosts keep one MeteorCollector per stream fed from
the single compacted readback.

The reference's only concurrency is intra-process threads
(SURVEY.md §2.4); it has no multi-camera scale-out at all.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..detectors.base import FrameResult
from ..log import BaseMetLog
from ..structs import Box, DLCfg
from ..track.features import calc_roi_gradient
from ..utils import expand_cls_pred
from .mesh import build_mesh


class MultiStreamMLDetector:
    """MLDetector over S independent streams, one mesh shard each."""

    def __init__(self, n_streams: int, window_sec: float, fps: float,
                 mask: np.ndarray, num_cls: int, cfg: DLCfg,
                 logger: BaseMetLog, mesh: Optional[Mesh] = None) -> None:
        from ..models import init_model
        self.s = n_streams
        self.num_cls = num_cls
        self.logger = logger
        self.n = max(int(window_sec * fps), 1)
        h, w = mask.shape[:2]
        c = mask.shape[2] if mask.ndim == 3 else 3
        self.mesh = mesh if mesh is not None else build_mesh(
            axis_name="stream")
        self._sharding = NamedSharding(self.mesh, P("stream"))
        self.model = init_model(cfg.model, logger=self.logger)
        self._hist = jax.device_put(
            np.zeros((self.s, self.n - 1, h, w, c), np.uint8),
            self._sharding)

        n = self.n

        def per_stream(hist, frames):
            # vmap over the local stream axis (one stream per shard on a
            # full mesh; several per device on a smaller one)
            def one(hh, ff):
                seq = jnp.concatenate([hh, ff], axis=0)
                out = jax.lax.reduce_window(
                    seq, jnp.uint8(0), jax.lax.max, (n, 1, 1, 1),
                    (1, 1, 1, 1), [(0, 0)] * 4)
                return out, seq[ff.shape[0]:]
            return jax.vmap(one)(hist, frames)

        spec = P("stream")
        self._winmax = jax.jit(shard_map(
            per_stream, mesh=self.mesh, in_specs=(spec, spec),
            out_specs=(spec, spec)))
        # keep the [S,T,...] -> [S*T,...] flatten on device with the
        # merged axis still sharded on the stream mesh
        self._flatten = jax.jit(
            lambda x: x.reshape((-1,) + x.shape[2:]),
            out_shardings=NamedSharding(self.mesh, P("stream")))

    def process_blocks_async(self, blocks: np.ndarray) -> Any:
        """blocks: [S, T, H, W, 3] uint8, one block per stream (same T).
        Dispatches the sharded window-max + every YOLO level; history
        carries advance immediately so block groups can pipeline."""
        assert blocks.shape[0] == self.s
        frames = jax.device_put(np.ascontiguousarray(blocks),
                                self._sharding)
        stacks, self._hist = self._winmax(self._hist, frames)
        handle = self.model.dispatch_batch_device(self._flatten(stacks))
        return stacks, handle, blocks.shape[1]

    def collect(self, handle: Any) -> list[list[FrameResult]]:
        """One compacted fetch for all streams; per-stream frame results
        with the same ROI-gradient box orientation as MLDetector."""
        stacks, model_handle, t = handle
        outs = self.model.collect_batch_device(model_handle)
        per_stream: list[list[FrameResult]] = []
        for si in range(self.s):
            results: list[FrameResult] = []
            for tt in range(t):
                pos, cls = outs[si * t + tt]
                if len(pos) == 0:
                    results.append((np.zeros((0, 4), int),
                                    np.zeros((0, self.num_cls))))
                    continue
                for i, coords in enumerate(pos):
                    box = Box.from_list(list(coords))
                    roi_dev = stacks[si, tt, box.y1:box.y2, box.x1:box.x2]
                    if roi_dev.size == 0:
                        continue
                    drct = calc_roi_gradient(np.asarray(roi_dev))
                    if (not np.isnan(drct)
                            and int(drct // (np.pi / 2)) % 2 == 1):
                        pos[i, [1, 3]] = pos[i, [3, 1]]
                results.append((pos, expand_cls_pred(cls)))
            per_stream.append(results)
        return per_stream

    def process_blocks(self, blocks: np.ndarray) -> list[list[FrameResult]]:
        return self.collect(self.process_blocks_async(blocks))


def detect_multi_stream_dldet(stream_frames: Sequence[np.ndarray], cfg,
                              rt_params, logger: BaseMetLog,
                              mesh: Optional[Mesh] = None,
                              block_frames: int = 64):
    """Run S in-memory COLOR streams through one sharded dldet pipeline
    with per-stream collectors; returns per-stream SingleMDRecord lists.

    stream_frames: S arrays [T, H, W, 3] uint8 (runtime-size color).
    rt_params: RuntimeParams shared by the streams.
    """
    from ..track.collector import MeteorCollector
    from ..utils import get_num_class

    s = len(stream_frames)
    h, w = stream_frames[0].shape[1:3]
    det = MultiStreamMLDetector(
        s, cfg.detector.window_sec, rt_params.eq_fps,
        np.ones((h, w, 3), np.uint8), num_cls=get_num_class(),
        cfg=cfg.detector.cfg, logger=logger, mesh=mesh)
    collectors = [
        MeteorCollector(cfg.collector, rt_params, video_loader=None,
                        logger=logger) for _ in range(s)]
    n_frames = min(f.shape[0] for f in stream_frames)
    e = rt_params.exp_frame
    eq_int_fps = max(rt_params.eq_int_fps, 1)
    for pos in range(0, n_frames - block_frames + 1, block_frames):
        blocks = np.stack([f[pos:pos + block_frames]
                           for f in stream_frames])
        per_stream = det.process_blocks(blocks)
        for si, results in enumerate(per_stream):
            for j, (lines, cates) in enumerate(results):
                if len(lines) or (pos + j) % eq_int_fps == 0:
                    collectors[si].update((pos + j) * e, lines=lines,
                                          cates=cates)
    for c in collectors:
        c.clear()
    return [c.met_exporter.meteor_list for c in collectors]
