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
from ..ops.hough import hough_lines_batch
from .mesh import build_mesh

MAX_ALLOW_GAP = 0.05  # parity with detectors/m3det.py MAX_ALLOW_GAP


def _halo_from_left(local: jax.Array, n: int, axis_name: str,
                    n_shards: int,
                    carry: Optional[jax.Array] = None) -> jax.Array:
    """Each shard receives the last n-1 frames of its LEFT neighbor; the
    first shard gets ``carry`` (the tail of the previous super-block) or
    zeros at stream start."""
    tail = local[-(n - 1):]
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    halo = jax.lax.ppermute(tail, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    first = jnp.zeros_like(halo) if carry is None else carry
    return jnp.where(idx == 0, first, halo)


def _tail_to_first(local: jax.Array, n: int, axis_name: str,
                   n_shards: int) -> jax.Array:
    """Route the LAST shard's n-1 tail frames to shard 0 (where the next
    super-block's first shard will need them as its left halo); all other
    shards carry zeros. Returned with a leading singleton so the gathered
    [s, n-1, ...] array round-trips through the same P(axis) spec."""
    tail = local[-(n - 1):]
    routed = jax.lax.ppermute(tail, axis_name, [(n_shards - 1, 0)])
    return routed[None]


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

    # Streaming carry protocol: every carry travels with a leading [s]
    # shard dim under P(axis_name), so a step's carry OUTPUT feeds the
    # next step's carry INPUT without resharding or host round trips.
    # The EMA carry is identical on every shard (all shards redundantly
    # run the same global scan); the gray/dy tails are routed from the
    # last shard to shard 0 (the only consumer) inside the program.

    def shard_fn(local_frames, ema_t, gray_carry_t, dy_carry_t, t_off_t):
        idx = jax.lax.axis_index(axis_name)
        t_offset = t_off_t[0]
        ema0 = jax.tree.map(lambda x: x[0], ema_t)
        timer0 = t_offset + idx.astype(jnp.int32) * t_local

        # phase 1: local window stats with gray/sub halos from the left
        # (shard 0's halo is the previous super-block's tail carry)
        gray_halo = _halo_from_left(local_frames, n, axis_name, s,
                                    carry=gray_carry_t[0])
        stats, _ = windows.window_stats(gray_halo, local_frames, n, timer0)
        sub_local = local_frames[:, r1:r2, c1:c2]
        sub_halo = gray_halo[:, r1:r2, c1:c2]
        stds_local, _ = windows.window_noise_std(sub_halo, sub_local, n,
                                                 timer0)

        # phase 2: exact global EMA -- stds are [T] scalars; gather them
        # and run the identical sequential scan redundantly on every shard
        stds_full = jax.lax.all_gather(stds_local, axis_name, tiled=True)
        thr_full, thr_f_full, ema_full, ema_final = _ema_threshold_scan(
            stds_full, t_offset, ema0, n=n,
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
            closed_halo = _halo_from_left(closed, n, axis_name, s,
                                          carry=dy_carry_t[0])
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

        # next-super-block carries
        ema_next = jax.tree.map(lambda x: x[None], ema_final)
        gray_next = _tail_to_first(local_frames, n, axis_name, s)
        dy_next = _tail_to_first(closed, n, axis_name, s)
        t_off_next = (t_offset + s * t_local)[None]
        return packed, dst, ema_next, gray_next, dy_next, t_off_next

    spec = P(axis_name)
    ema_specs = jax.tree.map(lambda _: spec, EmaState.init(0.9, 5.0))
    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, ema_specs, spec, spec, spec),
        out_specs=(spec, spec, ema_specs, spec, spec, spec)))


def init_temporal_carry(mesh: Mesh, axis_name: str, *, n: int, h: int,
                        w: int, momentum: float, init_threshold: float):
    """Fresh stream-start carry for :func:`temporal_m3_detect`: zero
    gray/dy histories, initial EMA state, t_offset 0 -- all sharded with a
    leading [s] dim so step outputs feed step inputs directly."""
    from ..detectors.m3det import EmaState

    s = mesh.devices.size
    spec = NamedSharding(mesh, P(axis_name))
    ema0 = EmaState.init(momentum, init_threshold)
    ema_t = jax.tree.map(
        lambda x: jax.device_put(
            jnp.broadcast_to(jnp.asarray(x)[None],
                             (s,) + jnp.asarray(x).shape), spec), ema0)
    gray0 = jax.device_put(np.zeros((s, n - 1, h, w), np.uint8), spec)
    dy0 = jax.device_put(np.zeros((s, n - 1, h, w), np.uint8), spec)
    t_off = jax.device_put(np.zeros((s,), np.int32), spec)
    return ema_t, gray0, dy0, t_off


def temporal_m3_detect(frames: np.ndarray, *, n: int, roi: tuple,
                       dy_mask: bool, mask_area: int, std_interval: int,
                       momentum: float, warmup_speed: float, adaptive: bool,
                       coef_a: float, coef_b: float, hough_threshold: int,
                       min_len: int, max_gap: float, max_points: int = 2048,
                       max_peaks: int = 32, mesh: Optional[Mesh] = None,
                       axis_name: str = "time", init_threshold: float = 5.0,
                       carry=None, return_carry: bool = False):
    """Full fused M3 detect over a time-sharded [T, H, W] stream segment.

    With ``carry=None``, semantics are identical to running
    detectors.m3det._m3_block_step on the whole block from stream start
    (timer0=0, zero histories, fresh EMA). Passing the carry returned by a
    previous call (``return_carry=True``) continues the stream exactly:
    the previous super-block's gray/binarized tails become shard 0's
    halos, the EMA scan resumes from its carried state, and warmup timers
    continue -- device-resident state, no host round trip.

    Returns (packed [T, K*5+6] f32, dst [T, H, W] u8), plus the
    next-super-block carry when ``return_carry``.
    """
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
    if carry is None:
        carry = init_temporal_carry(mesh, axis_name, n=n, h=h, w=w,
                                    momentum=momentum,
                                    init_threshold=init_threshold)
    ema_t, gray_t, dy_t, t_off = carry
    packed, dst, ema_n, gray_n, dy_n, t_off_n = fn(sharded, ema_t, gray_t,
                                                   dy_t, t_off)
    if return_carry:
        return packed, dst, (ema_n, gray_n, dy_n, t_off_n)
    return packed, dst


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
                                   select_subarea)
    from ..log import BaseMetLog
    from ..structs import RuntimeParams
    from ..track.collector import MeteorCollector
    from ..utils import get_num_class

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
    _feed_collector(collector, np.asarray(packed), 0, rt, num_cls,
                    max_peaks)
    collector.clear()
    return collector.met_exporter.meteor_list, t_total


def _feed_collector(collector, packed: np.ndarray, t_start: int, rt,
                    num_cls: int, max_peaks: int) -> None:
    """Run the host collector over one gathered packed buffer, with frame
    indices offset by ``t_start`` merged frames."""
    from ..detectors.m3det import NUM_LINES_TOOMUCH, _unpack
    from ..utils import lineset_nms

    lines_all, valid_all, extras = _unpack(packed, max_peaks)
    eq_int_fps = max(int(rt.eq_int_fps), 1)
    e = max(int(rt.exp_frame), 1)
    for j in range(packed.shape[0]):
        t = t_start + j
        fl = lines_all[j][valid_all[j]]
        if extras[j, 2] > 0.5 or len(fl) > NUM_LINES_TOOMUCH:
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


def detect_frames_temporal_streaming(block_iter, cfg, fps: float,
                                     mask: Optional[np.ndarray] = None,
                                     mesh: Optional[Mesh] = None,
                                     axis_name: str = "time",
                                     super_block_frames: int = 512,
                                     max_points: int = 8192,
                                     max_peaks: int = 64, logger=None,
                                     rt_params=None):
    """Streaming complement to :func:`detect_frames_temporal`: consume
    merged frames super-block by super-block with DEVICE-RESIDENT state
    carried across sharded steps, so host memory is bounded by one
    super-block instead of the whole clip (multi-hour monitoring videos).

    ``block_iter`` yields [T_i, H, W] uint8 merged-frame chunks of any
    size (e.g. BlockVideoLoader.pop_block). Chunks are re-batched into
    ``super_block_frames``-frame super-blocks (rounded down to a multiple
    of the mesh size); each runs the same sharded program as the
    whole-clip path, with the previous super-block's gray/binarized tails
    and EMA state flowing in as carries. Bit-equal to the whole-clip
    sharded run (tests/test_temporal_full.py).

    Returns (records, n_frames_used).
    """
    from ..detectors.m3det import (ABS_SENSITIVITY, SENSITIVITY_COEF,
                                   select_subarea)
    from ..log import BaseMetLog
    from ..structs import RuntimeParams
    from ..track.collector import MeteorCollector
    from ..utils import get_num_class

    logger = logger or BaseMetLog()
    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    super_block_frames = max(super_block_frames // s * s, s)

    bi = cfg.detector.cfg.binary
    adaptive = bool(bi.adaptive_bi_thre)
    coef_a, coef_b = (SENSITIVITY_COEF[bi.sensitivity] if adaptive
                      else (0.0, 0.0))
    init_thr = (ABS_SENSITIVITY[bi.sensitivity] if adaptive
                else bi.init_value)
    n = max(int(cfg.detector.window_sec * fps), 1)
    momentum = 1 - bi.interval / 60

    collector = None
    carry = None
    processed = 0
    pending: list[np.ndarray] = []
    n_pending = 0
    done = False
    it = iter(block_iter)
    while not done:
        # accumulate one super-block (or the final remainder)
        while n_pending < super_block_frames:
            try:
                chunk = next(it)
            except StopIteration:
                done = True
                break
            if chunk is None:
                done = True
                break
            pending.append(np.asarray(chunk))
            n_pending += pending[-1].shape[0]
        take = super_block_frames if n_pending >= super_block_frames \
            else n_pending // s * s
        if take == 0:
            break
        buf = np.concatenate(pending, axis=0) if len(pending) > 1 \
            else pending[0]
        frames, rest = buf[:take], buf[take:]
        pending = [rest] if rest.size else []
        n_pending = rest.shape[0] if rest.size else 0

        h, w = frames.shape[1:3]
        if collector is None:
            if mask is None:
                mask = np.ones((h, w), np.uint8)
            roi = select_subarea(mask, bi.area)
            mask_area = int(np.sum(mask))
            num_cls = get_num_class()
            rt = rt_params if rt_params is not None else RuntimeParams(
                fps=fps, exp_frame=1, eq_fps=fps, eq_int_fps=int(fps),
                exp_time=1 / fps, runtime_size=[w, h], raw_size=[w, h],
                positive_category_list=["METEOR"])
            collector = MeteorCollector(cfg.collector, rt,
                                        video_loader=None, logger=logger)
        if not np.all(mask == 1):
            frames = frames * mask[None]

        packed, _dst, carry = temporal_m3_detect(
            frames, n=n, roi=roi, dy_mask=bool(
                cfg.detector.cfg.dynamic.dy_mask),
            mask_area=mask_area, std_interval=bi.interval * n,
            momentum=momentum, warmup_speed=float(n), adaptive=adaptive,
            coef_a=coef_a, coef_b=coef_b,
            hough_threshold=int(cfg.detector.cfg.hough_line.threshold),
            min_len=int(cfg.detector.cfg.hough_line.min_len),
            max_gap=float(cfg.detector.cfg.hough_line.max_gap),
            max_points=max_points, max_peaks=max_peaks, mesh=mesh,
            axis_name=axis_name, init_threshold=float(init_thr),
            carry=carry, return_carry=True)
        _feed_collector(collector, np.asarray(packed), processed, rt,
                        num_cls, max_peaks)
        processed += take
    if collector is None:
        return [], 0
    collector.clear()
    return collector.met_exporter.meteor_list, processed
