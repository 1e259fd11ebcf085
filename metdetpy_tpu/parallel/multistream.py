"""Multi-stream detection: S camera feeds sharded over a device mesh.

Implements BASELINE.json config #5 ("8 concurrent 4K camera feeds,
vectorized Hough voting + recheck sharded across a v5e-4"): each stream's
fused M3 block step runs on its mesh shard via shard_map; per-stream window
/ EMA / dynamic-mask carries live sharded on device; per-stream collectors
stay on host consuming the single packed readback.

The reference's only concurrency is intra-process threads
(SURVEY.md §2.4); this is its scale-out replacement.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..detectors.base import FrameResult
from ..detectors.m3det import (ABS_SENSITIVITY, SENSITIVITY_COEF, EmaState,
                               _m3_block_step, _unpack, select_subarea)
from ..log import BaseMetLog
from ..structs import BinaryCfg
from ..utils import lineset_nms
from .mesh import build_mesh

NUM_LINES_TOOMUCH = 500


class MultiStreamM3Detector:
    """M3 detection over S independent streams, one mesh shard each."""

    def __init__(self, n_streams: int, window_sec: float, fps: float,
                 mask: np.ndarray, num_cls: int, cfg: BinaryCfg,
                 logger: BaseMetLog, mesh: Optional[Mesh] = None,
                 max_points: int = 8192, max_peaks: int = 64) -> None:
        self.s = n_streams
        self.num_cls = num_cls
        self.logger = logger
        self.mask_area = int(np.sum(mask))
        self.n = max(int(window_sec * fps), 1)
        h, w = mask.shape[:2]
        self.hw = (h, w)
        self.max_points = max_points
        self.max_peaks = max_peaks
        bi = cfg.binary
        self.std_roi = select_subarea(mask, bi.area)
        momentum = 1 - bi.interval / 60
        adaptive = bool(bi.adaptive_bi_thre)
        coef_a, coef_b = (SENSITIVITY_COEF[bi.sensitivity] if adaptive
                          else (0.0, 0.0))
        init_thr = (ABS_SENSITIVITY[bi.sensitivity] if adaptive
                    else bi.init_value)

        self.mesh = mesh if mesh is not None else build_mesh(
            axis_name="stream")
        if self.mesh.devices.size % 1 != 0:
            raise ValueError("invalid mesh")
        self._sharding = NamedSharding(self.mesh, P("stream"))

        step = functools.partial(
            _m3_block_step, n=self.n, roi=self.std_roi,
            dy_mask=bool(cfg.dynamic.dy_mask), mask_area=self.mask_area,
            std_interval=bi.interval * self.n, momentum=momentum,
            warmup_speed=float(self.n), adaptive=adaptive, coef_a=coef_a,
            coef_b=coef_b, hough_threshold=int(cfg.hough_line.threshold),
            min_len=int(cfg.hough_line.min_len),
            max_gap=float(cfg.hough_line.max_gap), max_points=max_points,
            max_peaks=max_peaks)

        def per_stream(gray, sub, dy, ema, frames, timer0):
            # vmap over the local stream axis: with a mesh smaller than the
            # stream count each device carries several streams (on a full
            # mesh the local axis has size 1)
            def one(g, su, d, e, f, t):
                packed, _dst, ng, ns, nd, ne, _nt = step(g, su, d, e, f, t)
                return packed, ng, ns, nd, ne
            return jax.vmap(one)(gray, sub, dy, ema, frames, timer0)

        spec = P("stream")
        self._step = jax.jit(shard_map(
            per_stream, mesh=self.mesh, in_specs=(spec,) * 6,
            out_specs=(spec,) * 5))

        # sharded carries
        r1, c1, r2, c2 = self.std_roi
        put = lambda x: jax.device_put(x, self._sharding)
        self._gray = put(np.zeros((self.s, self.n - 1, h, w), np.uint8))
        self._sub = put(np.zeros((self.s, self.n - 1, r2 - r1, c2 - c1),
                                 np.uint8))
        self._dy = put(np.zeros((self.s, self.n - 1, h, w), np.uint8))
        ema0 = EmaState.init(momentum, float(init_thr))
        self._ema = jax.tree.map(
            lambda x: put(np.broadcast_to(np.asarray(x)[None],
                                          (self.s,) + np.shape(x)).copy()),
            ema0)
        self.timer = 0

    def process_blocks_async(self, blocks: np.ndarray) -> Any:
        """blocks: [S, T, H, W] uint8, one block per stream (same T)."""
        assert blocks.shape[0] == self.s
        timer0 = jax.device_put(
            np.full((self.s,), self.timer, np.int32), self._sharding)
        frames = jax.device_put(blocks, self._sharding)
        packed, self._gray, self._sub, self._dy, self._ema = self._step(
            self._gray, self._sub, self._dy, self._ema, frames, timer0)
        self.timer += blocks.shape[1]
        return packed

    def collect(self, handle: Any) -> list[list[FrameResult]]:
        """One fetch for all streams; returns per-stream frame results."""
        buf = np.asarray(handle)  # [S, T, K*5+extras]
        out: list[list[FrameResult]] = []
        for s in range(self.s):
            lines, valid, extras = _unpack(buf[s], self.max_peaks)
            stream_results: list[FrameResult] = []
            for t in range(lines.shape[0]):
                if extras[t, 2] > 0.5:
                    stream_results.append((np.zeros((0, 4), int),
                                           np.zeros((0, self.num_cls))))
                    continue
                fl = lines[t][valid[t]]
                if len(fl) == 0 or len(fl) > NUM_LINES_TOOMUCH:
                    stream_results.append((np.zeros((0, 4), int),
                                           np.zeros((0, self.num_cls))))
                    continue
                nms_lines, nonline = lineset_nms(fl)
                cls_pred = np.zeros((len(nms_lines), self.num_cls))
                cls_pred[:, -1] = nonline
                cls_pred[:, 0] = 1 - nonline
                stream_results.append((nms_lines, cls_pred))
            out.append(stream_results)
        return out

    def process_blocks(self, blocks: np.ndarray) -> list[list[FrameResult]]:
        return self.collect(self.process_blocks_async(blocks))


def detect_multi_stream(stream_frames: Sequence[np.ndarray], cfg,
                        rt_params, logger: BaseMetLog,
                        mesh: Optional[Mesh] = None,
                        block_frames: int = 64,
                        max_points: int = 8192, max_peaks: int = 64):
    """Run S in-memory streams through one sharded pipeline with per-stream
    collectors; returns per-stream SingleMDRecord lists.

    stream_frames: S arrays [T, H, W] uint8 (grayscale runtime frames).
    rt_params: RuntimeParams shared by the streams.
    """
    from ..structs import RecheckCfg, ModelCfg
    from ..track.collector import MeteorCollector

    s = len(stream_frames)
    h, w = stream_frames[0].shape[1:3]
    mask = np.ones((h, w), np.uint8)
    det = MultiStreamM3Detector(
        s, cfg.detector.window_sec, rt_params.eq_fps, mask,
        num_cls=_num_cls(), cfg=cfg.detector.cfg, logger=logger, mesh=mesh,
        max_points=max_points, max_peaks=max_peaks)
    collectors = [
        MeteorCollector(cfg.collector, rt_params, video_loader=None,
                        logger=logger) for _ in range(s)]
    n_frames = min(f.shape[0] for f in stream_frames)
    e = rt_params.exp_frame
    for pos in range(0, n_frames - block_frames + 1, block_frames):
        blocks = np.stack([f[pos:pos + block_frames]
                           for f in stream_frames])
        per_stream = det.process_blocks(blocks)
        for si, results in enumerate(per_stream):
            for j, (lines, cates) in enumerate(results):
                frame_idx = (pos + j) * e
                if len(lines) or (pos + j) % max(rt_params.eq_int_fps,
                                                 1) == 0:
                    collectors[si].update(frame_idx, lines, cates)
    for c in collectors:
        c.clear()
    return [c.met_exporter.meteor_list for c in collectors]


def _num_cls() -> int:
    from ..utils import get_num_class
    return get_num_class()
