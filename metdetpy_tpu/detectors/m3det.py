"""Line detectors: the shared adaptive-threshold/noise machinery, the M3
(max-minus-mean) detector and the classic 4-frame detector -- restructured
as fully-fused batched device pipelines.

Algorithm parity with reference MetLib/Detector.py:160-448. Per block of T
merged frames, ONE jitted device step runs:

  rolling window max/mean + sub-ROI noise std (ops.windows)
  -> noise-EMA + adaptive threshold as a lax.scan over the block
     (the reference's per-frame host EMA, MetLib/Detector.py:225-229;
     device f32 instead of host float64 -- documented drift source)
  -> median3 -> binarize -> close -> dynamic mask -> batched Hough
  -> everything the host needs packed into ONE f32 buffer.

The single packed readback matters: on tunneled TPU backends a device->host
fetch costs ~100 ms of latency regardless of size, so the detector exposes
``process_block_async`` / ``collect`` and the caller pipelines blocks to
hide the roundtrip entirely.

Window history, binarized-response history (dynamic mask), EMA state and
the frame timer are carried across blocks as device residents.
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..log import BaseMetLog
from ..ops import filters, windows
from ..ops.hough import hough_lines_batch
from ..structs import BinaryCfg
from ..utils import lineset_nms
from .base import BaseDetector, FrameResult

NUM_LINES_TOOMUCH = 500
MAX_ALLOW_GAP = 0.05  # diff-area % at which the adaptive hough gap closes
N_EXTRAS = 6          # packed per-frame scalars (see _pack)

# sensitivity polynomial thr = a*sigma^2 + b
# (reference MetLib/Detector.py:177-183)
SENSITIVITY_COEF = {"low": (2.0, 4.4), "normal": (1.2, 3.6),
                    "high": (0.9, 3.0)}
ABS_SENSITIVITY = {"high": 3, "normal": 5, "low": 7}


def select_subarea(mask: np.ndarray, area: float):
    """Pick a mostly-unmasked centered sub-ROI for noise estimation
    (reference SNR_SW.select_subarea, MetLib/Detector.py:93-122): start at
    the center, walk the top edge up in steps of 10 while the unmasked
    ratio improves. Returns (row1, col1, row2, col2)."""
    h, w = mask.shape[:2]
    if area == 0:
        return (h // 2, w // 2, 0, 0)
    sub_rate = area ** 0.5
    sub_h, sub_w = int(h * sub_rate), int(w * sub_rate)
    x1, y1 = (h - sub_h) // 2, (w - sub_w) // 2
    pix = sub_h * sub_w
    light_ratio = np.sum(mask[x1:x1 + sub_h, y1:y1 + sub_w]) / pix
    while light_ratio < 1:
        x1 -= 10
        new_ratio = np.sum(mask[x1:x1 + sub_h, y1:y1 + sub_w]) / pix
        if new_ratio < light_ratio or x1 < 0:
            x1 += 10
            break
        light_ratio = new_ratio
    return (x1, y1, x1 + sub_h, y1 + sub_w)


class EmaState(NamedTuple):
    """Device-resident noise-EMA state (reference EMA w/ quadratic warmup,
    MetLib/utils.py:324-368)."""
    cur_value: jax.Array     # f32 scalar
    t: jax.Array             # i32 update count
    warmup_on: jax.Array     # bool
    cur_momentum: jax.Array  # f32
    bi_threshold: jax.Array  # f32 current integer threshold (as float)
    bi_thr_float: jax.Array  # f32 unrounded threshold (for visu)

    @staticmethod
    def init(momentum: float, init_threshold: float) -> "EmaState":
        return EmaState(jnp.float32(0.0), jnp.int32(0), jnp.asarray(True),
                        jnp.float32(momentum), jnp.float32(init_threshold),
                        jnp.float32(init_threshold))


def _ema_threshold_scan(stds: jax.Array, timer0: jax.Array, state: EmaState,
                        *, n: int, std_interval: int, momentum: float,
                        warmup_speed: float, adaptive: bool, coef_a: float,
                        coef_b: float) -> tuple[jax.Array, jax.Array,
                                                jax.Array, EmaState]:
    """Per-frame noise EMA + adaptive threshold over a block.

    Update schedule parity with SNR_SW.update (MetLib/Detector.py:81-91):
    every frame while 1 < timer <= n (fast warmup), then every std_interval
    frames. Threshold parity with LineDetector.update (:225-229) including
    round-half-to-even.
    """
    t_idx = jnp.arange(stds.shape[0], dtype=jnp.int32)
    timers = timer0 + 1 + t_idx

    def step(carry: EmaState, inp):
        std_t, timer = inp
        do_update = jnp.logical_or(
            jnp.logical_and(timer > n, timer % std_interval == 0),
            jnp.logical_and(timer > 1, timer <= n))

        def apply(c: EmaState) -> EmaState:
            k = c.t.astype(jnp.float32) * (1 - momentum) * warmup_speed
            warm_m = momentum * (1 - jnp.square(1 - k))
            cur_m = jnp.where(c.warmup_on & (k < 1), warm_m,
                              jnp.float32(momentum))
            warm_on = c.warmup_on & (k < 1)
            new_val = cur_m * c.cur_value + (1 - cur_m) * std_t
            return EmaState(new_val, c.t + 1, warm_on, cur_m,
                            c.bi_threshold, c.bi_thr_float)

        carry = jax.lax.cond(do_update, apply, lambda c: c, carry)
        if adaptive:
            thr_f = coef_a * jnp.square(carry.cur_value) + coef_b
            use = carry.cur_value != 0
            new_thr_f = jnp.where(use, thr_f, carry.bi_thr_float)
            new_thr = jnp.where(use, jnp.round(thr_f), carry.bi_threshold)
            carry = carry._replace(bi_threshold=new_thr,
                                   bi_thr_float=new_thr_f)
        return carry, (carry.bi_threshold, carry.bi_thr_float,
                       carry.cur_value)

    final, (thr, thr_f, ema_vals) = jax.lax.scan(step, state,
                                                 (stds, timers))
    return thr.astype(jnp.uint8), thr_f, ema_vals, final


@functools.partial(
    jax.jit,
    static_argnames=("n", "roi", "dy_mask", "mask_area", "std_interval",
                     "momentum", "warmup_speed", "adaptive", "coef_a",
                     "coef_b", "hough_threshold", "min_len", "max_gap",
                     "max_points", "max_peaks"))
def _m3_block_step(gray_hist, sub_hist, dy_hist, ema_state, frames, timer0,
                   *, n, roi, dy_mask, mask_area, std_interval, momentum,
                   warmup_speed, adaptive, coef_a, coef_b, hough_threshold,
                   min_len, max_gap, max_points, max_peaks):
    """The fused M3 step over one [T, H, W] block. Returns the packed host
    buffer plus new device carries (and the dst block for visu)."""
    r1, c1, r2, c2 = roi
    from ..ops.pallas_kernels import (fused_median_binarize_close,
                                      window_diff)
    diff, new_gray = window_diff(gray_hist, frames, n, timer0)
    stds, new_sub = windows.window_noise_std(
        sub_hist, frames[:, r1:r2, c1:c2], n, timer0)
    thr, thr_f, ema_vals, new_ema = _ema_threshold_scan(
        stds, timer0, ema_state, n=n, std_interval=std_interval,
        momentum=momentum, warmup_speed=warmup_speed, adaptive=adaptive,
        coef_a=coef_a, coef_b=coef_b)

    closed = fused_median_binarize_close(diff, thr)
    new_dy = dy_hist
    dst = closed
    if dy_mask:
        dy_sum, new_dy = windows.rolling_sum_u32(dy_hist, closed, n)
        t_block = closed.shape[0]
        timers = timer0 + 1 + jnp.arange(t_block, dtype=jnp.int32)
        lens = jnp.minimum(timers, n).astype(jnp.uint32)[:, None, None]
        # pixels active in >= length-1 window slots are hot (stars/towers):
        # erode the pass-mask and zero them (reference
        # MetLib/Detector.py:234-242)
        passmask = (dy_sum <= (lens - 1) * 255).astype(jnp.uint8)
        passmask = filters.erode3x3(passmask)
        dst = closed * passmask
    dst_sum = (jnp.sum(dst.astype(jnp.uint32), axis=(1, 2)) / 255.0
               / mask_area * 100.0)
    gap = jnp.maximum(0.0, 1.0 - dst_sum / MAX_ALLOW_GAP) * max_gap
    hough = hough_lines_batch(dst, gap.astype(jnp.float32),
                              threshold=hough_threshold, min_len=min_len,
                              max_points=max_points, max_peaks=max_peaks)
    packed = _pack(hough.lines, hough.valid, dst_sum, hough.npix,
                   hough.overflow, ema_vals, thr_f, thr)
    # the advanced frame timer is returned as a device carry: passing it
    # back in as a host np.int32 would cost one tiny h2d upload per block,
    # which on a high-latency link serializes every dispatch on a full
    # round trip (measured 73 ms/block on a degraded tunnel day)
    new_timer = timer0 + jnp.int32(frames.shape[0])
    return packed, dst, new_gray, new_sub, new_dy, new_ema, new_timer


def _pack(lines, valid, dst_sum, npix, overflow, ema_vals, thr_f, thr):
    """Pack all host-needed outputs into one [T, K*5 + N_EXTRAS] f32 buffer
    (a single device->host fetch per block)."""
    t_block, k, _ = lines.shape
    flat = jnp.concatenate([
        lines.astype(jnp.float32).reshape(t_block, k * 4),
        valid.astype(jnp.float32),
        dst_sum[:, None].astype(jnp.float32),
        npix[:, None].astype(jnp.float32),
        overflow[:, None].astype(jnp.float32),
        ema_vals[:, None],
        thr_f[:, None],
        thr[:, None].astype(jnp.float32),
    ], axis=1)
    return flat


def _unpack(buf: np.ndarray, k: int):
    t_block = buf.shape[0]
    lines = buf[:, :k * 4].reshape(t_block, k, 4).astype(np.int32)
    valid = buf[:, k * 4:k * 5] > 0.5
    extras = buf[:, k * 5:]
    return lines, valid, extras  # extras: dst_sum,npix,overflow,ema,thrf,thr


class LineDetector(BaseDetector):
    """Shared machinery: window stack, adaptive threshold, dynamic mask
    (reference LineDetector, MetLib/Detector.py:160-242)."""

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg: BinaryCfg, logger: BaseMetLog,
                 max_points: Optional[int] = None,
                 max_peaks: int = 64) -> None:
        if max_points is None:
            max_points = int(os.environ.get("METDETPY_TPU_MAX_POINTS", 8192))
        self.mask = mask
        self.num_cls = num_cls
        self.logger = logger
        self.mask_area = int(np.sum(mask))
        self.bi_cfg = cfg.binary
        self.hough_cfg = cfg.hough_line
        self.dynamic_cfg = cfg.dynamic
        self.max_points = max_points
        self.max_peaks = max_peaks

        self.n = max(int(window_sec * fps), 1)
        h, w = mask.shape[:2]
        self.hw = (h, w)

        # noise estimation config (reference SNR_SW, Detector.py:34-127)
        self.std_roi = select_subarea(mask, self.bi_cfg.area)
        self.noise_momentum = 1 - self.bi_cfg.interval / 60
        self.std_interval = self.bi_cfg.interval * self.n
        self.adaptive = bool(self.bi_cfg.adaptive_bi_thre)
        if self.adaptive:
            self.coef_a, self.coef_b = SENSITIVITY_COEF[
                self.bi_cfg.sensitivity]
            init_thr = ABS_SENSITIVITY[self.bi_cfg.sensitivity]
        else:
            self.coef_a, self.coef_b = 0.0, 0.0
            init_thr = self.bi_cfg.init_value
        self.bi_threshold = init_thr
        self.bi_threshold_float = float(init_thr)
        self.snr = 0.0

        # device-resident carries (the timer lives on device too -- see
        # _m3_block_step's new_timer note; self.timer is the host shadow
        # used for bookkeeping/checkpointing)
        self.timer = 0
        self._timer_dev = jnp.zeros((), dtype=jnp.int32)
        self._gray_hist = jnp.zeros((self.n - 1, h, w), dtype=jnp.uint8)
        r1, c1, r2, c2 = self.std_roi
        self._sub_hist = jnp.zeros((self.n - 1, r2 - r1, c2 - c1),
                                   dtype=jnp.uint8)
        self._dy_hist = jnp.zeros((self.n - 1, h, w), dtype=jnp.uint8)
        self._ema = EmaState.init(self.noise_momentum, float(init_thr))
        self._pending: list[np.ndarray] = []
        self._last: Optional[FrameResult] = None
        self._visu_state: dict = {}

    def reset_device_state(self) -> None:
        """Reinitialize all device-resident carries (window/sub-ROI/
        dynamic-mask histories, EMA, frame timer). Used by the block
        loop's failure recovery after a device/backend fault: detection
        restarts its warmup while the host-side collector keeps its
        accumulated tracks."""
        h, w = self.hw
        self.timer = 0
        self._timer_dev = jnp.zeros((), dtype=jnp.int32)
        self._gray_hist = jnp.zeros((self.n - 1, h, w), dtype=jnp.uint8)
        r1, c1, r2, c2 = self.std_roi
        self._sub_hist = jnp.zeros((self.n - 1, r2 - r1, c2 - c1),
                                   dtype=jnp.uint8)
        self._dy_hist = jnp.zeros((self.n - 1, h, w), dtype=jnp.uint8)
        self._ema = EmaState.init(self.noise_momentum,
                                  float(self.bi_threshold))
        self._pending = []
        self._last = None

    # -- async block API -------------------------------------------------

    def process_block_async(self, block: np.ndarray) -> Any:
        """Dispatch one block; returns an opaque handle for ``collect``.
        Device carries are updated immediately (dispatch is async)."""
        raise NotImplementedError

    def collect(self, handle: Any) -> list[FrameResult]:
        """Fetch a dispatched block's results (one host transfer)."""
        return self._collect_from_buf(np.asarray(handle[0]), handle)

    def collect_many(self, handles: list) -> list[list[FrameResult]]:
        """Collect a whole horizon of dispatched blocks with one
        device->host fetch per fixed-size GROUP: the per-block packed
        results are stacked on device (an async dispatch) and read back
        as single arrays.

        This is the deferred-collection primitive (api._run_block_loop):
        on a tunneled backend the process's FIRST d2h fetch permanently
        drops the transport into a synchronous per-chunk mode (~30x
        slower uploads, measured), so the pipeline dispatches every
        block of a horizon fetch-free and pays the mode switch once, at
        the end -- and on any backend it collapses per-block fetch round
        trips into one per group. The group size is FIXED (tail groups
        pad by repeating a handle) so exactly one stack program compiles
        regardless of horizon or video length.

        METDETPY_TPU_NO_FETCH=1 turns this into a compile-only warmup:
        the stack program is built and readied but nothing crosses to
        host (zero results are returned) -- the bench uses it to compile
        every pipeline shape without tripping the tunnel's post-fetch
        transport mode before the timed passes."""
        if not handles:
            return []
        group = max(1, int(os.environ.get("METDETPY_TPU_COLLECT_GROUP",
                                          8)))
        no_fetch = bool(os.environ.get("METDETPY_TPU_NO_FETCH"))
        bufs: list[np.ndarray] = []
        for a in range(0, len(handles), group):
            grp = [h[0] for h in handles[a:a + group]]
            k = len(grp)
            while len(grp) < group:
                grp.append(grp[0])  # pad: dropped after fetch
            stacked = jnp.stack(grp)
            if no_fetch:
                # compile-only warmup: ready the stack program, fetch
                # nothing, and return zero FrameResults DIRECTLY -- a
                # fabricated zero buffer through the stateful
                # _collect_from_buf would overwrite the detector's
                # snr/bi_threshold host shadows with decoded zeros
                # (ADVICE r4)
                jax.block_until_ready(stacked)
                t_block = int(stacked.shape[1])
                zero = (np.zeros((0, 4), int), np.zeros((0, self.num_cls)))
                bufs.extend([zero] * t_block for _ in range(k))
            else:
                arr = np.asarray(stacked)
                bufs.extend(arr[i] for i in range(k))
        if no_fetch:
            return bufs[: len(handles)]
        return [self._collect_from_buf(bufs[i], h)
                for i, h in enumerate(handles)]

    def handle_slim(self, handle: Any) -> Any:
        """Drop the visu plane (a full [T, H, W] dst block) from a
        dispatched handle; deferred collection keeps many handles alive
        and only needs the tiny packed result."""
        return (handle[0], None) + tuple(handle[2:])

    def _collect_from_buf(self, buf: np.ndarray,
                          handle: Any) -> list[FrameResult]:
        dst_dev = handle[1]
        lines, valid, extras = _unpack(buf, self.max_peaks)
        self.snr = float(extras[-1, 3])
        self.bi_threshold_float = float(extras[-1, 4])
        self.bi_threshold = int(extras[-1, 5])
        self._visu_state = {"dst": dst_dev, "dst_sum": float(extras[-1, 0]),
                            "lines_num": int(valid[-1].sum())}
        return self._post_lines(lines, valid, extras)

    def process_block(self, block: np.ndarray) -> list[FrameResult]:
        return self.collect(self.process_block_async(block))

    def _post_lines(self, lines, valid, extras) -> list[FrameResult]:
        results: list[FrameResult] = []
        for t in range(lines.shape[0]):
            if extras[t, 2] > 0.5:  # overflow: too-many-response frame drop
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            frame_lines = lines[t][valid[t]]
            if len(frame_lines) == 0 or len(frame_lines) > NUM_LINES_TOOMUCH:
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            results.append(self._classify_lines(frame_lines))
        return results

    def _classify_lines(self, frame_lines: np.ndarray) -> FrameResult:
        raise NotImplementedError

    # -- per-frame compat API ---------------------------------------------

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


class M3Detector(LineDetector):
    """Max-minus-mean detector over the sliding window (the default
    detector; reference M3Detector, MetLib/Detector.py:302-448)."""

    def _step_static_kwargs(self) -> dict:
        return dict(
            n=self.n, roi=self.std_roi,
            dy_mask=bool(self.dynamic_cfg.dy_mask),
            mask_area=self.mask_area, std_interval=self.std_interval,
            momentum=self.noise_momentum, warmup_speed=float(self.n),
            adaptive=self.adaptive, coef_a=self.coef_a, coef_b=self.coef_b,
            hough_threshold=int(self.hough_cfg.threshold),
            min_len=int(self.hough_cfg.min_len),
            max_gap=float(self.hough_cfg.max_gap),
            max_points=self.max_points, max_peaks=self.max_peaks)

    def process_block_async(self, block: np.ndarray) -> Any:
        (packed, dst, self._gray_hist, self._sub_hist, self._dy_hist,
         self._ema, self._timer_dev) = _m3_block_step(
            self._gray_hist, self._sub_hist, self._dy_hist, self._ema,
            jnp.asarray(block), self._timer_dev,
            **self._step_static_kwargs())
        self.timer += block.shape[0]
        return packed, dst

    def _classify_lines(self, frame_lines: np.ndarray) -> FrameResult:
        nms_lines, nonline_probs = lineset_nms(frame_lines)
        cls_pred = np.zeros((len(nms_lines), self.num_cls))
        cls_pred[:, -1] = nonline_probs    # OTHERS (area-like) prob
        cls_pred[:, 0] = 1 - nonline_probs  # METEOR (line-like) prob
        return nms_lines, cls_pred

    def visu(self):
        from ..visu import ImgVisuAttrs, TextColorPair, TextVisu
        state = self._visu_state
        out = []
        if state.get("dst") is not None:
            out.append(ImgVisuAttrs("mix_bg",
                                    img=np.asarray(state["dst"][-1]) // 255,
                                    weight=0.5, color="yellow"))
        out.extend([
            TextVisu("std_value", position="left-top", color="green",
                     text_list=[TextColorPair(text=f"STD:{self.snr:.4f}")]),
            TextVisu("bi_value", position="left-top", color="green",
                     text_list=[TextColorPair(
                         text=f"Bi_Threshold: {self.bi_threshold} (rounded "
                              f"from {self.bi_threshold_float:.4f})")]),
            TextVisu("lines_num", position="left-top", color="green",
                     text_list=[TextColorPair(
                         text=f"Line num: {state.get('lines_num', 0)}")]),
            TextVisu("area_ratio", position="left-top", color="green",
                     text_list=[TextColorPair(
                         text=f"Diff Area: {state.get('dst_sum', 0):.2f}%")]),
        ])
        return out


@functools.partial(
    jax.jit,
    static_argnames=("n", "roi", "std_interval", "momentum", "warmup_speed",
                     "adaptive", "coef_a", "coef_b", "hough_threshold",
                     "min_len", "max_gap", "max_points", "max_peaks"))
def _classic_block_step(gray_hist, sub_hist, classic_hist, ema_state, frames,
                        timer0, *, n, roi, std_interval, momentum,
                        warmup_speed, adaptive, coef_a, coef_b,
                        hough_threshold, min_len, max_gap, max_points,
                        max_peaks):
    """Batched uzanka 4-frame algorithm (reference ClassicDetector,
    MetLib/Detector.py:245-296): |f2-f3| -> binarize -> dilate -> invert ->
    AND with f0/f1 -> |.| -> binarize -> dilate -> Hough."""
    r1, c1, r2, c2 = roi
    # the gray window's stats are unused by the 4-frame algorithm; only
    # the history carry advances (XLA DCE'd the stats anyway)
    new_gray = jnp.concatenate([gray_hist, frames], axis=0)[frames.shape[0]:]
    stds, new_sub = windows.window_noise_std(
        sub_hist, frames[:, r1:r2, c1:c2], n, timer0)
    thr, thr_f, ema_vals, new_ema = _ema_threshold_scan(
        stds, timer0, ema_state, n=n, std_interval=std_interval,
        momentum=momentum, warmup_speed=warmup_speed, adaptive=adaptive,
        coef_a=coef_a, coef_b=coef_b)

    seq = jnp.concatenate([classic_hist, frames], axis=0)  # [3+T, H, W]
    t_block = frames.shape[0]
    # reference index mapping (MetLib/Detector.py:258-276): id3 = newest,
    # id0 = oldest; the NEWEST pair's diff builds the suppression mask and
    # detection runs on the masked OLDEST pair
    newest = seq[3:3 + t_block]
    newer = seq[2:2 + t_block]
    older = seq[1:1 + t_block]
    oldest = seq[0:t_block]
    thr_b = thr[:, None, None]
    diff23 = jnp.where(newer > newest, newer - newest, newest - newer)
    diff23 = filters.binary_threshold(diff23, thr_b)
    diff23 = 255 - filters.dilate3x3(diff23)
    a = jnp.bitwise_and(diff23, oldest)
    b = jnp.bitwise_and(diff23, older)
    dst = jnp.where(a > b, a - b, b - a)
    dst = filters.binary_threshold(dst, thr_b)
    dst = filters.dilate3x3(dst)
    gap = jnp.full((t_block,), max_gap, dtype=jnp.float32)
    hough = hough_lines_batch(dst, gap, threshold=hough_threshold,
                              min_len=min_len, max_points=max_points,
                              max_peaks=max_peaks)
    dst_sum = jnp.sum(dst.astype(jnp.uint32), axis=(1, 2)) / 255.0
    packed = _pack(hough.lines, hough.valid, dst_sum, hough.npix,
                   hough.overflow, ema_vals, thr_f, thr)
    new_timer = timer0 + jnp.int32(t_block)
    return packed, dst, new_gray, new_sub, seq[t_block:], new_ema, new_timer


class ClassicDetector(LineDetector):
    """4-frame differencing detector; all detections labeled METEOR
    (reference ClassicDetector, MetLib/Detector.py:245-299)."""

    CLASSIC_WINDOW = 4

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg: BinaryCfg, logger: BaseMetLog,
                 **kw) -> None:
        # window is hardcoded to 4 frames regardless of window_sec
        # (reference MetLib/Detector.py:249-255)
        # The 4-frame dst has no median blur or dynamic mask quieting it,
        # so noisy video binarizes+dilates to tens of thousands of points
        # per frame; the M3 point budget would overflow-drop frames the
        # reference keeps (it only drops at >500 LINES,
        # MetLib/Detector.py:358-360). Derive the default budget from the
        # frame AREA instead: 1/8 of the pixels (a dilated ~1% noise
        # floor) with the M3 default as floor and 64k as cap (the static
        # compaction capacity — one compiled program per resolution). An
        # explicit METDETPY_TPU_MAX_POINTS or caller kwarg wins verbatim.
        if "max_points" not in kw or kw["max_points"] is None:
            import os
            env = os.environ.get("METDETPY_TPU_MAX_POINTS")
            if env is not None:
                kw["max_points"] = int(env)
            else:
                area = int(np.prod(mask.shape[:2]))
                kw["max_points"] = min(max(8192, area // 8), 1 << 16)
        super().__init__(self.CLASSIC_WINDOW / fps, fps, mask, num_cls, cfg,
                         logger, **kw)
        self._classic_hist = jnp.zeros((3,) + self.hw, dtype=jnp.uint8)

    def reset_device_state(self) -> None:
        super().reset_device_state()
        self._classic_hist = jnp.zeros((3,) + self.hw, dtype=jnp.uint8)

    def process_block_async(self, block: np.ndarray) -> Any:
        (packed, dst, self._gray_hist, self._sub_hist, self._classic_hist,
         self._ema, self._timer_dev) = _classic_block_step(
            self._gray_hist, self._sub_hist, self._classic_hist, self._ema,
            jnp.asarray(block), self._timer_dev, n=self.n,
            roi=self.std_roi, std_interval=self.std_interval,
            momentum=self.noise_momentum, warmup_speed=float(self.n),
            adaptive=self.adaptive, coef_a=self.coef_a, coef_b=self.coef_b,
            hough_threshold=int(self.hough_cfg.threshold),
            min_len=int(self.hough_cfg.min_len),
            max_gap=float(self.hough_cfg.max_gap),
            max_points=self.max_points, max_peaks=self.max_peaks)
        warmup_start = self.timer
        self.timer += block.shape[0]
        return packed, dst, warmup_start

    def _collect_from_buf(self, buf: np.ndarray,
                          handle: Any) -> list[FrameResult]:
        results = super()._collect_from_buf(buf, handle)
        warmup_start = handle[2]
        # no detection until the 4-frame window is full
        for t in range(len(results)):
            if warmup_start + t + 1 < self.CLASSIC_WINDOW:
                results[t] = (np.zeros((0, 4), int),
                              np.zeros((0, self.num_cls)))
        return results

    def _classify_lines(self, frame_lines: np.ndarray) -> FrameResult:
        cls_pred = np.zeros((len(frame_lines), self.num_cls))
        cls_pred[:, 0] = 1  # always METEOR
        return frame_lines, cls_pred


class DiffAreaGuidingDetecor(BaseDetector):
    """EMA-background experimental detector; returns no lines (parity with
    the incomplete reference implementation, MetLib/Detector.py:451-519).

    Background maintenance uses Uint8EMA exactly as the reference does
    (warmup-adjusted momentum, int16-promoted blend,
    MetLib/utils.py:371-415); the reference defers the EMA update until
    after diffing (post_update, MetLib/Detector.py:488-501)."""

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg, logger: BaseMetLog) -> None:
        from ..utils import Uint8EMA
        self.logger = logger
        momentum = 1 - 1 / (window_sec * fps)
        self.logger.info(f"Momentum={momentum:.4f}")
        self.bg_maintainer = Uint8EMA(momentum=momentum)
        self.cur_frame: Optional[np.ndarray] = None
        self.diff_img: Optional[np.ndarray] = None
        self.num_cls = num_cls

    def update(self, new_frame: np.ndarray) -> None:
        self.cur_frame = new_frame

    def post_update(self) -> None:
        self.bg_maintainer.update(self.cur_frame)

    def detect(self) -> FrameResult:
        if self.bg_maintainer.t == 0:
            self.bg_maintainer.update(self.cur_frame)
            self.diff_img = np.zeros_like(self.cur_frame)
            return np.zeros((0, 4), int), np.zeros((0, self.num_cls))
        self.diff_img = ((self.cur_frame.astype(np.float64) + 100)
                         > self.bg_maintainer.cur_value).astype(np.uint8) * 255
        self.post_update()
        return np.zeros((0, 4), int), np.zeros((0, self.num_cls))
