"""Unit tests for detector internals: on-device EMA threshold schedule vs a
float64 host oracle replicating the reference semantics, and sub-ROI
selection."""

import numpy as np

from metdetpy_tpu.detectors.m3det import (ABS_SENSITIVITY, EmaState,
                                          _ema_threshold_scan,
                                          select_subarea)
from metdetpy_tpu.utils import EMA


def _host_oracle(stds, n, interval, momentum, sens_a, sens_b, init_thr):
    """Reference-semantics oracle: host float64 EMA with warmup + threshold
    rounding (reference SNR_SW.update + LineDetector.update)."""
    ema = EMA(momentum=momentum, warmup_speed=n)
    std_interval = interval * n
    thr = init_thr
    thr_f = float(init_thr)
    out_thr, out_f, out_ema = [], [], []
    for i, s in enumerate(stds):
        timer = i + 1
        if (timer > n and timer % std_interval == 0) or (1 < timer <= n):
            ema.update(float(s))
        if ema.cur_value != 0:
            thr_f = sens_a * ema.cur_value ** 2 + sens_b
            thr = round(thr_f)
        out_thr.append(thr)
        out_f.append(thr_f)
        out_ema.append(ema.cur_value)
    return np.array(out_thr), np.array(out_f), np.array(out_ema)


def test_ema_threshold_scan_matches_host_oracle(rng):
    n, interval = 8, 2
    momentum = 1 - interval / 60
    a, b = 1.2, 3.6
    init_thr = ABS_SENSITIVITY["normal"]
    stds = rng.uniform(1.0, 6.0, size=60).astype(np.float32)

    # device: run in two chunks with carried state
    state = EmaState.init(momentum, float(init_thr))
    thr_all, thrf_all, ema_all = [], [], []
    timer0 = 0
    for chunk in (stds[:23], stds[23:]):
        thr, thr_f, ema_vals, state = _ema_threshold_scan(
            chunk, np.int32(timer0), state, n=n, std_interval=interval * n,
            momentum=momentum, warmup_speed=float(n), adaptive=True,
            coef_a=a, coef_b=b)
        thr_all.append(np.asarray(thr))
        thrf_all.append(np.asarray(thr_f))
        ema_all.append(np.asarray(ema_vals))
        timer0 += len(chunk)
    got_thr = np.concatenate(thr_all)
    got_f = np.concatenate(thrf_all)
    got_ema = np.concatenate(ema_all)

    ref_thr, ref_f, ref_ema = _host_oracle(stds, n, interval, momentum, a, b,
                                           init_thr)
    np.testing.assert_allclose(got_ema, ref_ema, rtol=2e-5)
    np.testing.assert_allclose(got_f, ref_f, rtol=2e-5)
    # thresholds are small ints; f32 vs f64 may flip rare .5-boundary cases
    assert np.mean(got_thr == ref_thr) > 0.95
    np.testing.assert_allclose(got_thr.astype(float), ref_thr, atol=1)


def test_ema_no_adaptive_keeps_init():
    state = EmaState.init(0.9, 7.0)
    stds = np.ones(10, np.float32) * 3
    thr, thr_f, _, _ = _ema_threshold_scan(
        stds, np.int32(0), state, n=4, std_interval=8, momentum=0.9,
        warmup_speed=4.0, adaptive=False, coef_a=0.0, coef_b=0.0)
    assert np.all(np.asarray(thr) == 7)


def test_select_subarea_centered_when_unmasked():
    mask = np.ones((100, 200), np.uint8)
    r1, c1, r2, c2 = select_subarea(mask, 0.1)
    # centered, ~sqrt(0.1) of each side
    assert (r2 - r1) == int(100 * 0.1 ** 0.5)
    assert (c2 - c1) == int(200 * 0.1 ** 0.5)
    assert abs((r1 + r2) / 2 - 50) <= 1 and abs((c1 + c2) / 2 - 100) <= 1


def test_select_subarea_walks_up_from_masked_bottom():
    mask = np.ones((100, 200), np.uint8)
    mask[40:, :] = 0  # masked lower part -> sub-ROI should move up
    r1, c1, r2, c2 = select_subarea(mask, 0.1)
    assert r2 <= 42  # walked up until fully in the unmasked area


def test_uint8_ema_matches_reference_semantics():
    """Uint8EMA parity with the reference (MetLib/utils.py:371-415):
    warmup-adjusted momentum + int16-promoted float blend."""
    from metdetpy_tpu.utils import Uint8EMA

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (20, 8, 9), np.uint8)
    ema = Uint8EMA(momentum=0.9, warmup_speed=1)

    # inline oracle transcribing the reference math
    init_m, warm, cur_m, cur_v, t = 0.9, 1.0, 0.9, 0.0, 0
    for f in frames:
        if warm > 0:
            k = t * (1 - init_m) * warm
            if k < 1:
                cur_m = init_m * (1 - (1 - k) ** 2)
            else:
                warm, cur_m = 0, init_m
        cur_v = cur_m * cur_v + (1 - cur_m) * f.astype(np.int16)
        t += 1
        ema.update(f)
        np.testing.assert_allclose(ema.cur_value, cur_v, rtol=1e-12)
    assert ema.t == 20


def test_diff_area_guiding_uses_uint8_ema():
    """DiffAreaGuidingDetecor parity shape: first frame seeds the bg and
    yields a zero diff; later frames diff against the Uint8EMA background
    (reference MetLib/Detector.py:488-501)."""
    from metdetpy_tpu.detectors.m3det import DiffAreaGuidingDetecor
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.utils import Uint8EMA

    rng = np.random.default_rng(4)
    det = DiffAreaGuidingDetecor(window_sec=0.4, fps=10.0,
                                 mask=np.ones((6, 6), np.uint8),
                                 num_cls=3, cfg=None, logger=BaseMetLog())
    assert isinstance(det.bg_maintainer, Uint8EMA)
    f0 = rng.integers(0, 256, (6, 6), np.uint8)
    det.update(f0)
    lines, cls = det.detect()
    assert lines.shape == (0, 4) and cls.shape == (0, 3)
    assert det.diff_img is not None and not det.diff_img.any()
    assert det.bg_maintainer.t == 1
    f1 = np.full((6, 6), 255, np.uint8)
    det.update(f1)
    det.detect()
    # bright frame over a seeded background must flag foreground
    assert det.diff_img.any()
    assert det.bg_maintainer.t == 2
