"""Line detectors: the shared adaptive-threshold/noise machinery, the M3
(max-minus-mean) detector and the classic 4-frame detector -- restructured
as batched device pipelines.

Algorithm parity with reference MetLib/Detector.py:160-448; instead of the
reference's per-frame OpenCV calls, each block of T merged frames runs two
jitted device phases:

  phase A: rolling window max/mean + sub-ROI noise std for every position
           (ops.windows; replaces the O(n*H*W)-per-frame np.max hot spot).
  host:    sequential noise-EMA -> per-frame adaptive binary thresholds
           (tiny scalar math, kept in float64 for threshold-rounding parity
           with the reference, MetLib/Detector.py:227-229).
  phase B: median3 -> binarize -> close -> dynamic mask -> batched Hough
           (ops.filters + ops.hough), then host-side line NMS.

Window history, binarized-response history (dynamic mask) and the frame
timer are carried across blocks.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..log import BaseMetLog
from ..ops import filters, windows
from ..ops.hough import hough_lines_batch
from ..structs import BinaryCfg
from ..utils import EMA, lineset_nms
from .base import BaseDetector, FrameResult

NUM_LINES_TOOMUCH = 500
MAX_ALLOW_GAP = 0.05  # diff-area % at which the adaptive hough gap closes


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


@functools.partial(jax.jit, static_argnames=("n", "r1", "c1", "r2", "c2"))
def _phase_a(gray_hist, sub_hist, frames, n, timer0, r1, c1, r2, c2):
    stats, new_hist = windows.window_stats(gray_hist, frames, n, timer0)
    sub_frames = frames[:, r1:r2, c1:c2]
    stds, new_sub_hist = windows.window_noise_std(sub_hist, sub_frames, n,
                                                  timer0)
    return stats, stds, new_hist, new_sub_hist


@functools.partial(
    jax.jit,
    static_argnames=("n", "dy_mask", "mask_area", "hough_threshold",
                     "min_len", "max_gap", "max_points", "max_peaks"))
def _phase_b(diff, thr, dy_hist, timer0, *, n, dy_mask, mask_area,
             hough_threshold, min_len, max_gap, max_points, max_peaks):
    med = filters.median3x3(diff)
    binary = filters.binary_threshold(med, thr[:, None, None])
    closed = filters.close3x3(binary)
    new_dy_hist = dy_hist
    dst = closed
    if dy_mask:
        dy_sum, new_dy_hist = windows.rolling_sum_u32(dy_hist, closed, n)
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
    return dst, dst_sum, hough, new_dy_hist


class LineDetector(BaseDetector):
    """Shared machinery: window stack, adaptive threshold, dynamic mask
    (reference LineDetector, MetLib/Detector.py:160-242)."""

    SENSITIVITY_FUNC: dict[str, Callable[[float], float]] = {
        "low": lambda x: 2.0 * x ** 2 + 4.4,
        "normal": lambda x: 1.2 * x ** 2 + 3.6,
        "high": lambda x: 0.9 * x ** 2 + 3,
    }
    ABS_SENSITIVITY = {"high": 3, "normal": 5, "low": 7}

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg: BinaryCfg, logger: BaseMetLog,
                 max_points: Optional[int] = None,
                 max_peaks: int = 64) -> None:
        if max_points is None:
            # active-pixel capacity for the Hough vote; overridable for
            # small-footprint test runs
            import os
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

        # noise estimation state (reference SNR_SW, MetLib/Detector.py:34-127)
        self.std_roi = select_subarea(mask, self.bi_cfg.area)
        noise_momentum = 1 - self.bi_cfg.interval / 60
        self.noise_ema = EMA(momentum=noise_momentum, warmup_speed=self.n)
        self.std_interval = self.bi_cfg.interval * self.n

        # adaptive threshold state
        if self.bi_cfg.adaptive_bi_thre:
            self.std2thre = self.SENSITIVITY_FUNC[self.bi_cfg.sensitivity]
            self.bi_threshold = self.ABS_SENSITIVITY[self.bi_cfg.sensitivity]
        else:
            self.std2thre = None
            self.bi_threshold = self.bi_cfg.init_value
        self.bi_threshold_float = float(self.bi_threshold)

        # device-resident carries
        self.timer = 0
        self._gray_hist = jnp.zeros((self.n - 1, h, w), dtype=jnp.uint8)
        r1, c1, r2, c2 = self.std_roi
        self._sub_hist = jnp.zeros((self.n - 1, r2 - r1, c2 - c1),
                                   dtype=jnp.uint8)
        self._dy_hist = jnp.zeros((self.n - 1, h, w), dtype=jnp.uint8)
        self._pending: list[np.ndarray] = []
        self._last: Optional[FrameResult] = None
        self._visu_state: dict = {}

    # -- host threshold schedule ----------------------------------------

    def _thresholds_for_block(self, stds: np.ndarray) -> np.ndarray:
        """Sequential noise-EMA over the block's per-position stds, then the
        sensitivity polynomial with python-round (banker's) rounding --
        matching the reference update schedule exactly
        (SNR_SW.update MetLib/Detector.py:81-91 + LineDetector.update
        :225-229)."""
        t_block = len(stds)
        out = np.empty((t_block,), dtype=np.uint8)
        for i in range(t_block):
            timer = self.timer + i + 1
            if timer > self.n and timer % self.std_interval == 0:
                self.noise_ema.update(float(stds[i]))
            elif 1 < timer <= self.n:
                self.noise_ema.update(float(stds[i]))
            if self.bi_cfg.adaptive_bi_thre and self.noise_ema.cur_value != 0:
                self.bi_threshold_float = self.std2thre(
                    self.noise_ema.cur_value)
                self.bi_threshold = round(self.bi_threshold_float)
            out[i] = np.uint8(self.bi_threshold)
        return out

    @property
    def snr(self) -> float:
        return float(self.noise_ema.cur_value)

    # -- per-frame compat API --------------------------------------------

    def update(self, new_frame: np.ndarray) -> None:
        self._pending.append(np.asarray(new_frame, dtype=np.uint8))

    def detect(self) -> FrameResult:
        if self._pending:
            block = np.stack(self._pending)
            self._pending.clear()
            results = self.process_block(block)
            self._last = results[-1]
        if self._last is None:
            return np.zeros((0, 4), int), np.zeros((0, self.num_cls))
        return self._last

    def process_block(self, block: np.ndarray) -> list[FrameResult]:
        raise NotImplementedError


class M3Detector(LineDetector):
    """Max-minus-mean detector over the sliding window (the default
    detector; reference M3Detector, MetLib/Detector.py:302-448)."""

    def process_block(self, block: np.ndarray) -> list[FrameResult]:
        t_block = block.shape[0]
        r1, c1, r2, c2 = self.std_roi
        stats, stds_dev, self._gray_hist, self._sub_hist = _phase_a(
            self._gray_hist, self._sub_hist, jnp.asarray(block), self.n,
            np.int32(self.timer), r1, c1, r2, c2)
        thr = self._thresholds_for_block(np.asarray(stds_dev))
        dst, dst_sum_dev, hough, self._dy_hist = _phase_b(
            stats.diff, jnp.asarray(thr), self._dy_hist,
            np.int32(self.timer), n=self.n,
            dy_mask=bool(self.dynamic_cfg.dy_mask),
            mask_area=self.mask_area,
            hough_threshold=int(self.hough_cfg.threshold),
            min_len=int(self.hough_cfg.min_len),
            max_gap=float(self.hough_cfg.max_gap),
            max_points=self.max_points, max_peaks=self.max_peaks)
        self.timer += t_block

        # compact readbacks: [T,K,4] lines + masks + scalars
        lines_np = np.asarray(hough.lines)
        valid_np = np.asarray(hough.valid)
        overflow_np = np.asarray(hough.overflow)
        dst_sum = np.asarray(dst_sum_dev)
        self._visu_state = {
            "dst": dst, "dst_sum": float(dst_sum[-1]),
            "lines_num": int(valid_np[-1].sum()),
        }

        results: list[FrameResult] = []
        for t in range(t_block):
            if overflow_np[t]:
                # analog of the reference's >NUM_LINES_TOOMUCH frame drop
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            lines = lines_np[t][valid_np[t]]
            if len(lines) == 0 or len(lines) > NUM_LINES_TOOMUCH:
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            nms_lines, nonline_probs = lineset_nms(lines)
            cls_pred = np.zeros((len(nms_lines), self.num_cls))
            cls_pred[:, -1] = nonline_probs    # OTHERS (area-like) prob
            cls_pred[:, 0] = 1 - nonline_probs  # METEOR (line-like) prob
            results.append((nms_lines, cls_pred))
        return results

    def visu(self):
        from ..visu import ImgVisuAttrs, TextColorPair, TextVisu
        state = self._visu_state
        out = []
        if "dst" in state:
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
    static_argnames=("hough_threshold", "min_len", "max_gap", "max_points",
                     "max_peaks"))
def _classic_phase(hist, frames, thr, *, hough_threshold, min_len, max_gap,
                   max_points, max_peaks):
    """Batched uzanka 4-frame algorithm (reference ClassicDetector,
    MetLib/Detector.py:245-296): |f2-f3| -> binarize -> dilate -> invert ->
    AND with f0/f1 -> |.| -> binarize -> dilate -> Hough."""
    seq = jnp.concatenate([hist, frames], axis=0)  # [3+T, H, W]
    t_block = frames.shape[0]
    f0 = seq[3:3 + t_block]       # newest
    f1 = seq[2:2 + t_block]
    f2 = seq[1:1 + t_block]
    f3 = seq[0:t_block]           # oldest
    thr_b = thr[:, None, None]
    diff23 = jnp.where(f2 > f3, f2 - f3, f3 - f2)
    diff23 = filters.binary_threshold(diff23, thr_b)
    diff23 = 255 - filters.dilate3x3(diff23)
    a = jnp.bitwise_and(diff23, f0)
    b = jnp.bitwise_and(diff23, f1)
    dst = jnp.where(a > b, a - b, b - a)
    dst = filters.binary_threshold(dst, thr_b)
    dst = filters.dilate3x3(dst)
    gap = jnp.full((t_block,), max_gap, dtype=jnp.float32)
    hough = hough_lines_batch(dst, gap, threshold=hough_threshold,
                              min_len=min_len, max_points=max_points,
                              max_peaks=max_peaks)
    return hough, seq[t_block:]


class ClassicDetector(LineDetector):
    """4-frame differencing detector; all detections labeled METEOR
    (reference ClassicDetector, MetLib/Detector.py:245-299)."""

    CLASSIC_WINDOW = 4

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg: BinaryCfg, logger: BaseMetLog,
                 **kw) -> None:
        # window is hardcoded to 4 frames regardless of window_sec
        # (reference MetLib/Detector.py:249-255)
        super().__init__(self.CLASSIC_WINDOW / fps, fps, mask, num_cls, cfg,
                         logger, **kw)

    def process_block(self, block: np.ndarray) -> list[FrameResult]:
        t_block = block.shape[0]
        r1, c1, r2, c2 = self.std_roi
        _, stds_dev, self._gray_hist, self._sub_hist = _phase_a(
            self._gray_hist, self._sub_hist, jnp.asarray(block), self.n,
            np.int32(self.timer), r1, c1, r2, c2)
        thr = self._thresholds_for_block(np.asarray(stds_dev))
        if not hasattr(self, "_classic_hist"):
            self._classic_hist = jnp.zeros((3,) + self.hw, dtype=jnp.uint8)
        hough, self._classic_hist = _classic_phase(
            self._classic_hist, jnp.asarray(block), jnp.asarray(thr),
            hough_threshold=int(self.hough_cfg.threshold),
            min_len=int(self.hough_cfg.min_len),
            max_gap=float(self.hough_cfg.max_gap),
            max_points=self.max_points, max_peaks=self.max_peaks)
        warmup_end = self.timer + 1
        self.timer += t_block

        lines_np = np.asarray(hough.lines)
        valid_np = np.asarray(hough.valid)
        results: list[FrameResult] = []
        for t in range(t_block):
            # no detection until the 4-frame window is full
            if warmup_end + t < self.CLASSIC_WINDOW:
                results.append((np.zeros((0, 4), int),
                                np.zeros((0, self.num_cls))))
                continue
            lines = lines_np[t][valid_np[t]]
            cls_pred = np.zeros((len(lines), self.num_cls))
            cls_pred[:, 0] = 1  # always METEOR
            results.append((lines, cls_pred))
        return results


class DiffAreaGuidingDetecor(BaseDetector):
    """EMA-background experimental detector; returns no lines (parity with
    the incomplete reference implementation, MetLib/Detector.py:451-519)."""

    def __init__(self, window_sec: float, fps: float, mask: np.ndarray,
                 num_cls: int, cfg, logger: BaseMetLog) -> None:
        self.logger = logger
        momentum = 1 - 1 / (window_sec * fps)
        self.logger.info(f"Momentum={momentum:.4f}")
        self.momentum = momentum
        self.bg = None
        self.t = 0
        self.cur_frame: Optional[np.ndarray] = None
        self.diff_img: Optional[np.ndarray] = None
        self.num_cls = num_cls

    def update(self, new_frame: np.ndarray) -> None:
        self.cur_frame = new_frame

    def _ema_update(self) -> None:
        v = np.asarray(self.cur_frame, dtype=np.int16)
        if self.bg is None or self.t == 0:
            self.bg = v.astype(np.float64) * (1 - self.momentum)
        else:
            self.bg = self.momentum * self.bg + (1 - self.momentum) * v
        self.t += 1

    def detect(self) -> FrameResult:
        if self.t == 0:
            self._ema_update()
            self.diff_img = np.zeros_like(self.cur_frame)
            return np.zeros((0, 4), int), np.zeros((0, self.num_cls))
        self.diff_img = ((self.cur_frame.astype(np.float64) + 100)
                         > self.bg).astype(np.uint8) * 255
        self._ema_update()
        return np.zeros((0, 4), int), np.zeros((0, self.num_cls))
