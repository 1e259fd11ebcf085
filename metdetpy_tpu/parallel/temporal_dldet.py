"""Time-sharded dldet batch detection: the MLDetector pipeline with the
clip's time axis sharded over the device mesh.

Per-shard device work: the rolling color window-max over the local
frames with an (n-1)-frame halo ppermuted from the left neighbor
(shard 0's halo is zeros — exactly MLDetector's initial history), then
the device-resident YOLO forward on the local stacks (batch axis =
time, so XLA partitions the convolutions with no collectives at all).
Host-side the per-frame candidates feed the same MeteorCollector update
cadence as the streaming block loop, so results are exactly equal to
the sequential path (tests/test_temporal_dldet.py).

The streaming variant carries the last shard's (n-1)-frame tail to
shard 0 between super-blocks (device-resident), bounding host RAM by
one super-block for multi-hour timelapse/monitoring videos.

Reference comparison: the reference MLDetector is strictly sequential,
one onnxruntime call per stacked window under a global lock
(MetLib/Detector.py:522-573, model.py:142-166); time sharding over a
mesh is TPU-native scale-out with no reference analog.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import build_mesh
from .temporal import _halo_from_left, _tail_to_first


@functools.lru_cache(maxsize=16)
def _build_window_max_fn(mesh: Mesh, axis_name: str, n: int, s: int):
    def shard_fn(local, carry_tail):
        halo = _halo_from_left(local, n, axis_name, s,
                               carry=carry_tail[0])
        seq = jnp.concatenate([halo, local], axis=0)
        out = jax.lax.reduce_window(seq, jnp.uint8(0), jax.lax.max,
                                    (n, 1, 1, 1), (1, 1, 1, 1),
                                    [(0, 0)] * 4)
        return out, _tail_to_first(local, n, axis_name, s)

    spec = P(axis_name)
    return jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec),
                             out_specs=(spec, spec)))


def temporal_window_max_color(frames, n: int, mesh: Mesh,
                              axis_name: str = "time", carry=None):
    """Sharded rolling window-max over [T, H, W, 3] uint8 frames (T must
    divide by the mesh size). ``carry`` is the previous super-block's
    gathered [s, n-1, H, W, 3] tail (zeros-except-shard-0) or None at
    stream start. Returns (stacks_dev sharded on time, next_carry)."""
    from jax.sharding import NamedSharding
    s = mesh.devices.size
    if not isinstance(frames, jax.Array):
        # shard the upload directly onto the mesh (staging the whole
        # clip on one chip would bound clip size by a single HBM and
        # double the transfer)
        frames = jax.device_put(np.ascontiguousarray(frames),
                                NamedSharding(mesh, P(axis_name)))
    if n == 1:
        return frames, carry
    assert frames.shape[0] // s >= n - 1, (
        f"each time shard must hold at least the window halo "
        f"(n-1={n - 1} frames); got {frames.shape[0]}/{s} per shard -- "
        f"use fewer shards or longer super-blocks")
    if carry is None:
        carry = jnp.zeros((s, n - 1) + frames.shape[1:], jnp.uint8)
    fn = _build_window_max_fn(mesh, axis_name, n, s)
    return fn(frames, carry)


def _feed_collector_dldet(collector, results, t_start: int, rt) -> None:
    """Mirror the block loop's collector cadence (api._run_block_loop
    consume): update on frames with candidates and on the eq-fps tick."""
    eq_int_fps = max(int(rt.eq_int_fps), 1)
    e = max(int(rt.exp_frame), 1)
    for j, (lines, cates) in enumerate(results):
        t = t_start + j
        if len(lines) or t % eq_int_fps == 0:
            collector.update(t * e, lines=lines, cates=cates)


def _make_runtime(cfg, fps: float, h: int, w: int, rt_params):
    from ..structs import RuntimeParams
    if rt_params is not None:
        return rt_params
    return RuntimeParams(fps=fps, exp_frame=1, eq_fps=fps,
                         eq_int_fps=int(fps), exp_time=1 / fps,
                         runtime_size=[w, h], raw_size=[w, h],
                         positive_category_list=["METEOR"])


def _make_detector(cfg, fps: float, mask: Optional[np.ndarray],
                   h: int, w: int, logger):
    from ..detectors.mldet import MLDetector
    from ..utils import get_num_class
    det_mask = (mask if mask is not None
                else np.ones((h, w, 3), np.uint8))
    return MLDetector(window_sec=cfg.detector.window_sec, fps=fps,
                      mask=det_mask, num_cls=get_num_class(),
                      cfg=cfg.detector.cfg, logger=logger)


def detect_frames_temporal_dldet(frames: np.ndarray, cfg, fps: float,
                                 mask: Optional[np.ndarray] = None,
                                 mesh: Optional[Mesh] = None,
                                 axis_name: str = "time", logger=None,
                                 rt_params=None):
    """Batch-detect a whole in-memory color clip with MLDetector, time
    axis sharded over the mesh. frames: [T, H, W, 3] uint8 runtime-size;
    the time axis is PADDED (repeat of the last frame, results trimmed)
    up to a shardable length, so every real frame is processed — clips
    shorter than the mesh included.

    Returns (records, n_frames_used)."""
    from ..log import BaseMetLog
    from ..track.collector import MeteorCollector

    logger = logger or BaseMetLog()
    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    t_real = frames.shape[0]
    if t_real == 0:
        raise ValueError("no frames decoded")
    h, w = frames.shape[1:3]
    if mask is not None:
        frames = (frames * (mask if mask.ndim == 3 else mask[..., None])
                  ).astype(np.uint8)

    det = _make_detector(cfg, fps, mask, h, w, logger)
    n = det.n
    # pad the time axis to a multiple of the mesh size that also gives
    # every shard its (n-1)-frame halo; windows are backward-looking, so
    # padded rows never affect real rows and their results are trimmed
    target = -(-max(t_real, (n - 1) * s, s) // s) * s
    if target > t_real:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], target - t_real, axis=0)])
    stacks_dev, _ = temporal_window_max_color(frames, n, mesh, axis_name)
    batch_out = det.model.forward_batch_device(stacks_dev)
    results = det._orient_results(stacks_dev, batch_out)[:t_real]

    rt = _make_runtime(cfg, fps, h, w, rt_params)
    collector = MeteorCollector(cfg.collector, rt, video_loader=None,
                                logger=logger)
    _feed_collector_dldet(collector, results, 0, rt)
    collector.clear()
    return collector.met_exporter.meteor_list, t_real


def detect_frames_temporal_dldet_streaming(block_iter, cfg, fps: float,
                                           mask: Optional[np.ndarray]
                                           = None,
                                           mesh: Optional[Mesh] = None,
                                           axis_name: str = "time",
                                           super_block_frames: int = 512,
                                           logger=None, rt_params=None):
    """Streaming complement: consume color merged frames super-block by
    super-block with the (n-1)-frame window tail carried on device
    between sharded steps. Bit-equal to the whole-clip mode; host RAM is
    bounded by one super-block. Returns (records, n_frames_used)."""
    from ..log import BaseMetLog
    from ..track.collector import MeteorCollector

    logger = logger or BaseMetLog()
    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    n_win = max(int(cfg.detector.window_sec * fps), 1)
    # every middle super-block must give each shard the (n-1)-frame halo
    sb = max(super_block_frames // s, n_win - 1, 1) * s

    det = None
    collector = None
    rt = None
    carry = None
    t_done = 0
    pending: list[np.ndarray] = []
    n_pending = 0

    def run_super_block(chunk: np.ndarray):
        nonlocal det, collector, rt, carry, t_done
        if det is None:
            h, w = chunk.shape[1:3]
            det = _make_detector(cfg, fps, mask, h, w, logger)
            rt = _make_runtime(cfg, fps, h, w, rt_params)
            collector = MeteorCollector(cfg.collector, rt,
                                        video_loader=None, logger=logger)
        if mask is not None:
            chunk = (chunk * (mask if mask.ndim == 3
                              else mask[..., None])).astype(np.uint8)
        n_real = chunk.shape[0]
        # tail super-block: pad up to a shardable halo-safe length;
        # results trimmed (same rule as the whole-clip mode)
        target = -(-max(n_real, (det.n - 1) * s, s) // s) * s
        if target > n_real:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], target - n_real, axis=0)])
        stacks_dev, carry = temporal_window_max_color(
            chunk, det.n, mesh, axis_name, carry=carry)
        batch_out = det.model.forward_batch_device(stacks_dev)
        results = det._orient_results(stacks_dev, batch_out)[:n_real]
        _feed_collector_dldet(collector, results, t_done, rt)
        t_done += n_real

    for blk in block_iter:
        pending.append(np.asarray(blk))
        n_pending += pending[-1].shape[0]
        while n_pending >= sb:
            buf = np.concatenate(pending, axis=0)
            run_super_block(buf[:sb])
            rest = buf[sb:]
            pending = [rest] if rest.size else []
            n_pending = rest.shape[0] if rest.size else 0
    if n_pending:  # tail: padded + trimmed inside run_super_block
        run_super_block(np.concatenate(pending, axis=0))
    if collector is not None:
        collector.clear()
        return collector.met_exporter.meteor_list, t_done
    return [], 0
