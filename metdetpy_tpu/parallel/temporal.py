"""Temporal (sequence) sharding with halo exchange.

The reference's "long context" axis is frame time, handled by O(1) rolling
sums on one core (SURVEY.md §5.7). The TPU scale-out analog: shard a long
frame block's time axis across the mesh and exchange an (n-1)-frame halo
between neighboring shards over ICI (jax.lax.ppermute) so every position
still sees its full trailing window -- the only "context parallelism" this
domain needs.

``temporal_m3_detect`` runs the COMPLETE fused M3 detect step
(window stats -> EMA adaptive threshold -> median/binarize/close ->
dynamic mask -> batched Hough -> packed readback) time-sharded, with
results exactly equal to the single-device ``_m3_block_step``
(tests/test_temporal_full.py asserts bit-equality).

EMA sequential-consistency semantics (the documented design choice): the
noise EMA is an inherently sequential scan over per-frame sub-ROI stds.
Those stds are SCALARS -- [T] floats -- so instead of approximating (e.g.
per-shard independent EMAs, which would change thresholds at shard
boundaries), each shard all_gathers the full [T] std vector over ICI
(negligible bytes) and redundantly runs the identical sequential scan,
then slices its local thresholds. Exact global semantics, zero
approximation; only the O(T*H*W) pixel work is actually sharded.

The dynamic-mask history halo is the subtle one: a shard needs the last
n-1 BINARIZED frames of its left neighbor, which are themselves outputs
of this step. Since binarization is local given (gray halo, thresholds),
every shard first computes its own binarized block, then ppermutes its
tail to the right neighbor *inside the same shard_map body* -- two
collective phases, one program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import filters, windows
from ..ops.hough import hough_lines_batch, pvary_like
from .mesh import build_mesh

MAX_ALLOW_GAP = 0.05  # parity with detectors/m3det.py MAX_ALLOW_GAP


def _halo_from_left(local: jax.Array, n: int, axis_name: str,
                    n_shards: int) -> jax.Array:
    """Each shard receives the last n-1 frames of its LEFT neighbor; the
    first shard gets zeros (stream start)."""
    tail = local[-(n - 1):]
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    halo = jax.lax.ppermute(tail, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(halo), halo)


@functools.lru_cache(maxsize=32)
def _build_window_stats_fn(mesh: Mesh, axis_name: str, n: int, s: int,
                           t_local: int, h: int, w: int):
    def shard_fn(local_frames):
        halo = _halo_from_left(local_frames, n, axis_name, s)
        idx = jax.lax.axis_index(axis_name)
        timer0 = idx.astype(jnp.int32) * t_local
        stats, _ = windows.window_stats(halo, local_frames, n, timer0)
        return stats.win_max, stats.win_mean, stats.diff

    spec = P(axis_name)
    return jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=(spec,),
                             out_specs=(spec, spec, spec)))


def temporal_window_stats(frames: np.ndarray, n: int,
                          mesh: Optional[Mesh] = None,
                          axis_name: str = "time"):
    """Rolling window max/mean over a time-sharded [T, H, W] block.

    Each shard holds T/S consecutive frames; the trailing n-1 frames of the
    left neighbor arrive via ppermute before the local rolling reduction.
    The first shard uses zero history (stream start). The compiled
    shard_map program is cached per (mesh, shapes, n).

    Returns WindowStats for all T positions (gathered).
    """
    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    t_total, h, w = frames.shape
    assert t_total % s == 0, "T must divide the mesh size"
    assert t_total // s >= n - 1, (
        "each time shard must hold at least n-1 frames for the halo")
    fn = _build_window_stats_fn(mesh, axis_name, n, s, t_total // s, h, w)
    sharded = jax.device_put(frames, NamedSharding(mesh, P(axis_name)))
    win_max, win_mean, diff = fn(sharded)
    return windows.WindowStats(win_max, win_mean, diff)


@functools.lru_cache(maxsize=16)
def _build_m3_fn(mesh: Mesh, axis_name: str, *, n: int, s: int,
                 t_local: int, h: int, w: int, roi: tuple, dy_mask: bool,
                 mask_area: int, std_interval: int, momentum: float,
                 warmup_speed: float, adaptive: bool, coef_a: float,
                 coef_b: float, hough_threshold: int, min_len: int,
                 max_gap: float, max_points: int, max_peaks: int):
    from ..detectors.m3det import EmaState, _ema_threshold_scan, _pack
    from ..ops.pallas_kernels import fused_median_binarize_close

    r1, c1, r2, c2 = roi

    def shard_fn(local_frames, ema0):
        idx = jax.lax.axis_index(axis_name)
        timer0 = idx.astype(jnp.int32) * t_local

        # phase 1: local window stats with gray/sub halos from the left
        gray_halo = _halo_from_left(local_frames, n, axis_name, s)
        stats, _ = windows.window_stats(gray_halo, local_frames, n, timer0)
        sub_local = local_frames[:, r1:r2, c1:c2]
        sub_halo = gray_halo[:, r1:r2, c1:c2]
        stds_local, _ = windows.window_noise_std(sub_halo, sub_local, n,
                                                 timer0)

        # phase 2: exact global EMA -- stds are [T] scalars; gather them
        # and run the identical sequential scan redundantly on every shard
        stds_full = jax.lax.all_gather(stds_local, axis_name, tiled=True)
        # the replicated EMA carry must be promoted to vary like the
        # gathered stds, or the lax.scan carry types mismatch (see
        # ops.hough.pvary_like)
        ema_varying = jax.tree.map(lambda x: pvary_like(x, stds_full), ema0)
        thr_full, thr_f_full, ema_full, _ = _ema_threshold_scan(
            stds_full, jnp.int32(0), ema_varying, n=n,
            std_interval=std_interval, momentum=momentum,
            warmup_speed=warmup_speed, adaptive=adaptive, coef_a=coef_a,
            coef_b=coef_b)
        start = idx * t_local
        thr = jax.lax.dynamic_slice_in_dim(thr_full, start, t_local)
        thr_f = jax.lax.dynamic_slice_in_dim(thr_f_full, start, t_local)
        ema_vals = jax.lax.dynamic_slice_in_dim(ema_full, start, t_local)

        # phase 3: binarize locally, THEN exchange the binarized-history
        # halo for the dynamic mask
        closed = fused_median_binarize_close(stats.diff, thr)
        dst = closed
        if dy_mask:
            closed_halo = _halo_from_left(closed, n, axis_name, s)
            dy_sum, _ = windows.rolling_sum_u32(closed_halo, closed, n)
            timers = timer0 + 1 + jnp.arange(t_local, dtype=jnp.int32)
            lens = jnp.minimum(timers, n).astype(jnp.uint32)[:, None, None]
            passmask = (dy_sum <= (lens - 1) * 255).astype(jnp.uint8)
            passmask = filters.erode3x3(passmask)
            dst = closed * passmask

        # phase 4: per-frame Hough + pack (frame-local, fully sharded)
        dst_sum = (jnp.sum(dst.astype(jnp.uint32), axis=(1, 2)) / 255.0
                   / mask_area * 100.0)
        gap = jnp.maximum(0.0, 1.0 - dst_sum / MAX_ALLOW_GAP) * max_gap
        hough = hough_lines_batch(dst, gap.astype(jnp.float32),
                                  threshold=hough_threshold,
                                  min_len=min_len, max_points=max_points,
                                  max_peaks=max_peaks)
        packed = _pack(hough.lines, hough.valid, dst_sum, hough.npix,
                       hough.overflow, ema_vals, thr_f, thr)
        return packed, dst

    spec = P(axis_name)
    ema_spec = P()  # replicated initial EMA state
    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, jax.tree.map(lambda _: ema_spec,
                                     EmaState.init(0.9, 5.0))),
        out_specs=(spec, spec)))


def temporal_m3_detect(frames: np.ndarray, *, n: int, roi: tuple,
                       dy_mask: bool, mask_area: int, std_interval: int,
                       momentum: float, warmup_speed: float, adaptive: bool,
                       coef_a: float, coef_b: float, hough_threshold: int,
                       min_len: int, max_gap: float, max_points: int = 2048,
                       max_peaks: int = 32, mesh: Optional[Mesh] = None,
                       axis_name: str = "time", init_threshold: float = 5.0):
    """Full fused M3 detect over a time-sharded [T, H, W] stream segment.

    Semantics identical to running detectors.m3det._m3_block_step on the
    whole block from stream start (timer0=0, zero histories, fresh EMA).
    Returns (packed [T, K*5+6] f32, dst [T, H, W] u8), both gathered.
    """
    from ..detectors.m3det import EmaState

    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    t_total, h, w = frames.shape
    assert t_total % s == 0, "T must divide the mesh size"
    assert t_total // s >= n - 1, (
        "each time shard must hold at least n-1 frames for the halo")

    fn = _build_m3_fn(mesh, axis_name, n=n, s=s, t_local=t_total // s,
                      h=h, w=w, roi=tuple(roi), dy_mask=dy_mask,
                      mask_area=mask_area, std_interval=std_interval,
                      momentum=momentum, warmup_speed=warmup_speed,
                      adaptive=adaptive, coef_a=coef_a, coef_b=coef_b,
                      hough_threshold=hough_threshold, min_len=min_len,
                      max_gap=max_gap, max_points=max_points,
                      max_peaks=max_peaks)
    sharded = jax.device_put(frames, NamedSharding(mesh, P(axis_name)))
    ema0 = EmaState.init(momentum, init_threshold)
    ema0 = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x),
                                 NamedSharding(mesh, P())), ema0)
    return fn(sharded, ema0)


def detect_frames_temporal(frames: np.ndarray, cfg, fps: float,
                           mask: Optional[np.ndarray] = None,
                           mesh: Optional[Mesh] = None,
                           axis_name: str = "time",
                           max_points: int = 8192, max_peaks: int = 64,
                           logger=None, rt_params=None):
    """Batch-detect a whole in-memory clip with the time axis sharded
    over the mesh: ONE sharded device program produces every frame's
    lines, then the host collector runs over the gathered results.

    The batch-processing complement to the streaming ``detect_video``
    loop: on an N-chip slice an N-times-longer clip is detected in the
    same device wall time (halo exchange + the exact global EMA are the
    only cross-chip traffic). frames: [T, H, W] uint8 runtime-size
    grayscale; T is truncated to a multiple of the mesh size.

    Returns (records, n_frames_used): the MDRF result records and how
    many leading frames were actually processed.
    """
    from ..detectors.m3det import (ABS_SENSITIVITY, SENSITIVITY_COEF,
                                   NUM_LINES_TOOMUCH, _unpack,
                                   select_subarea)
    from ..log import BaseMetLog
    from ..structs import RuntimeParams
    from ..track.collector import MeteorCollector
    from ..utils import get_num_class, lineset_nms

    logger = logger or BaseMetLog()
    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    t_total = frames.shape[0] // s * s
    frames = frames[:t_total]
    h, w = frames.shape[1:3]
    if mask is None:
        mask = np.ones((h, w), np.uint8)
    else:
        frames = frames * mask[None]

    bi = cfg.detector.cfg.binary
    adaptive = bool(bi.adaptive_bi_thre)
    coef_a, coef_b = (SENSITIVITY_COEF[bi.sensitivity] if adaptive
                      else (0.0, 0.0))
    init_thr = (ABS_SENSITIVITY[bi.sensitivity] if adaptive
                else bi.init_value)
    n = max(int(cfg.detector.window_sec * fps), 1)
    packed, _dst = temporal_m3_detect(
        frames, n=n, roi=select_subarea(mask, bi.area),
        dy_mask=bool(cfg.detector.cfg.dynamic.dy_mask),
        mask_area=int(np.sum(mask)), std_interval=bi.interval * n,
        momentum=1 - bi.interval / 60, warmup_speed=float(n),
        adaptive=adaptive, coef_a=coef_a, coef_b=coef_b,
        hough_threshold=int(cfg.detector.cfg.hough_line.threshold),
        min_len=int(cfg.detector.cfg.hough_line.min_len),
        max_gap=float(cfg.detector.cfg.hough_line.max_gap),
        max_points=max_points, max_peaks=max_peaks, mesh=mesh,
        axis_name=axis_name, init_threshold=float(init_thr))

    num_cls = get_num_class()
    rt = rt_params if rt_params is not None else RuntimeParams(
        fps=fps, exp_frame=1, eq_fps=fps, eq_int_fps=int(fps),
        exp_time=1 / fps, runtime_size=[w, h], raw_size=[w, h],
        positive_category_list=["METEOR"])
    collector = MeteorCollector(cfg.collector, rt, video_loader=None,
                                logger=logger)
    lines_all, valid_all, extras = _unpack(np.asarray(packed), max_peaks)
    eq_int_fps = max(int(rt.eq_int_fps), 1)
    e = max(int(rt.exp_frame), 1)
    for t in range(t_total):
        fl = lines_all[t][valid_all[t]]
        if extras[t, 2] > 0.5 or len(fl) > NUM_LINES_TOOMUCH:
            fl = np.zeros((0, 4), int)
        if len(fl):
            nms_lines, nonline = lineset_nms(fl)
            cls_pred = np.zeros((len(nms_lines), num_cls))
            cls_pred[:, -1] = nonline
            cls_pred[:, 0] = 1 - nonline
            collector.update(t * e, nms_lines, cls_pred)
        elif t % eq_int_fps == 0:
            collector.update(t * e, np.zeros((0, 4), int),
                             np.zeros((0, num_cls)))
    collector.clear()
    return collector.met_exporter.meteor_list, t_total
