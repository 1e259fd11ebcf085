"""Device kept-row compaction + device ROI orientation (dldet collect
path): the compacted single-scale readback must reproduce the
uncompacted postprocess bit-for-bit, and the on-device Sobel
circular-mean orientation must agree with the host reference
(track.features.calc_roi_gradient / reference MetLib/feature.py:17-34)
to f32 tolerance with identical quadrant (flip) decisions."""

import numpy as np
import pytest

import jax.numpy as jnp

from metdetpy_tpu.detectors.mldet import (_ORIENT_CAP, _orient_from_packed)
from metdetpy_tpu.models.yolo import (YOLOModel, _compact_kept_device,
                                      _sel_nms_device)
from metdetpy_tpu.track.features import calc_roi_gradient


def _shell_model():
    m = YOLOModel.__new__(YOLOModel)
    from metdetpy_tpu.log import BaseMetLog
    m.logger = BaseMetLog()
    m.w = m.h = 320
    m.nc = 8
    return m


def _random_sel(rng, b=6, k=32, nc=8):
    """Plausible decoded candidates: xywh at model scale + obj + cls."""
    sel = np.zeros((b, k, 5 + nc), np.float32)
    sel[..., 0] = rng.uniform(0, 320, (b, k))
    sel[..., 1] = rng.uniform(0, 320, (b, k))
    sel[..., 2] = rng.uniform(2, 80, (b, k))
    sel[..., 3] = rng.uniform(2, 80, (b, k))
    sel[..., 4] = rng.uniform(0, 1, (b, k))
    sel[..., 5:] = rng.uniform(0, 1, (b, k, nc))
    return sel


@pytest.mark.smoke
def test_compact_matches_uncompacted_postprocess():
    rng = np.random.default_rng(7)
    sel = _random_sel(rng)
    m = _shell_model()
    order, keep = _sel_nms_device(jnp.asarray(sel), pos_thre=0.25,
                                  nms_thre=0.45)
    packed, counts, total = _compact_kept_device(
        jnp.asarray(sel), order, keep, 1024)
    got = m._unpack_compact(np.asarray(packed), np.asarray(counts),
                            int(np.asarray(total)), sel.shape[0],
                            (1.5, 0.75))
    want = m._postprocess_batch_nms(
        sel, (1.5, 0.75), order_keep=(np.asarray(order), np.asarray(keep)))
    assert int(np.asarray(total)) > 0   # the fixture must keep rows
    assert len(got) == len(want)
    for (gp, gc), (wp, wc) in zip(got, want):
        np.testing.assert_array_equal(gp, wp)
        np.testing.assert_array_equal(gc, wc)
    # surviving-row index side channel covers every surviving row
    assert sum(len(ix) for ix in m._last_compact_rowidx) == sum(
        len(gp) for gp, _ in got)


@pytest.mark.smoke
def test_compact_cap_truncates_with_warning():
    rng = np.random.default_rng(11)
    sel = _random_sel(rng, b=4, k=16)
    m = _shell_model()
    order, keep = _sel_nms_device(jnp.asarray(sel), pos_thre=0.25,
                                  nms_thre=0.45)
    total_all = int(np.asarray(jnp.sum(keep)))
    cap = max(1, total_all // 2)
    packed, counts, total = _compact_kept_device(
        jnp.asarray(sel), order, keep, cap)
    assert int(np.asarray(total)) == total_all
    got = m._unpack_compact(np.asarray(packed), np.asarray(counts),
                            int(np.asarray(total)), sel.shape[0],
                            (1.0, 1.0))
    assert sum(len(gp) for gp, _ in got) <= cap


def _host_orientation(stacks, t, box_model, sw, sh):
    """Exactly what MLDetector's host path computes for one box."""
    import cv2
    bx = np.asarray(box_model, np.float32) * np.array(
        [sw, sh, sw, sh], np.float32)
    x1, y1, x2, y2 = bx.astype(int)
    roi_bgr = stacks[t, y1:y2, x1:x2]
    if roi_bgr.size == 0:
        return float("nan")
    roi = cv2.cvtColor(roi_bgr, cv2.COLOR_BGR2GRAY)
    return calc_roi_gradient(roi)


@pytest.mark.smoke
def test_device_orientation_matches_host():
    rng = np.random.default_rng(3)
    t_n, h, w = 3, 180, 320
    stacks = rng.integers(0, 50, (t_n, h, w, 3)).astype(np.uint8)
    # paint oriented streaks so the gradient field has real structure
    for t in range(t_n):
        for _ in range(4):
            x0, y0 = rng.integers(20, w - 60), rng.integers(20, h - 60)
            dx, dy = rng.integers(-30, 30), rng.integers(10, 40)
            for s in np.linspace(0, 1, 60):
                xx, yy = int(x0 + s * dx), int(y0 + s * dy)
                stacks[t, yy - 1:yy + 2, xx - 1:xx + 2] = 220
    boxes = []
    for t in range(t_n):
        for _ in range(5):
            x1 = rng.integers(-10, w - 40)
            y1 = rng.integers(-10, h - 40)
            boxes.append((t, x1, y1, x1 + rng.integers(8, 60),
                          y1 + rng.integers(8, 60)))
    packed = np.zeros((_ORIENT_CAP, 14), np.float32)
    for i, (t, x1, y1, x2, y2) in enumerate(boxes):
        packed[i, 0] = t
        packed[i, 1:5] = (x1, y1, x2, y2)
    out = np.asarray(_orient_from_packed(
        jnp.asarray(stacks), jnp.asarray(packed), jnp.float32(1.0),
        jnp.float32(1.0), 96))
    n_checked = 0
    for i, (t, x1, y1, x2, y2) in enumerate(boxes):
        sc, cc, wtot, ok = out[i]
        assert ok > 0
        want = _host_orientation(stacks, t, (x1, y1, x2, y2), 1.0, 1.0)
        if wtot == 0:
            assert np.isnan(want) or want == 0.0
            continue
        got = float(np.arctan2(sc, cc) % (2 * np.pi))
        assert abs((got - want + np.pi) % (2 * np.pi) - np.pi) < 1e-3, (
            i, got, want)
        # the consumer only uses the quadrant parity (diagonal flip)
        assert (int(got // (np.pi / 2)) % 2 == int(want // (np.pi / 2)) % 2)
        n_checked += 1
    assert n_checked >= 10


@pytest.mark.smoke
def test_device_orientation_flags_oversize():
    rng = np.random.default_rng(5)
    stacks = rng.integers(0, 255, (1, 200, 320, 3)).astype(np.uint8)
    packed = np.zeros((4, 14), np.float32)
    packed[0, 1:5] = (0, 0, 150, 150)     # > p=96 -> host fallback
    packed[1, 1:5] = (10, 10, 50, 60)     # fine
    out = np.asarray(_orient_from_packed(
        jnp.asarray(stacks), jnp.asarray(packed), jnp.float32(1.0),
        jnp.float32(1.0), 96))
    assert out[0][3] == 0.0
    assert out[1][3] == 1.0
