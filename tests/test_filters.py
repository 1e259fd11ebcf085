"""Golden tests: device filters vs OpenCV kernels on random images."""

import cv2
import numpy as np

from metdetpy_tpu.ops import filters


def test_median3x3_matches_cv2(rng):
    img = rng.integers(0, 256, size=(4, 37, 53), dtype=np.uint8)
    ours = np.asarray(filters.median3x3(img))
    for t in range(img.shape[0]):
        ref = cv2.medianBlur(img[t], 3)
        np.testing.assert_array_equal(ours[t], ref)


def test_binary_threshold_matches_cv2(rng):
    img = rng.integers(0, 256, size=(29, 31), dtype=np.uint8)
    for thr in (0, 5, 127, 254):
        ours = np.asarray(filters.binary_threshold(img, np.uint8(thr)))
        _, ref = cv2.threshold(img, thr, 255, cv2.THRESH_BINARY)
        np.testing.assert_array_equal(ours, ref)


def test_per_frame_threshold_broadcast(rng):
    img = rng.integers(0, 256, size=(3, 16, 16), dtype=np.uint8)
    thr = np.array([10, 100, 200], dtype=np.uint8)[:, None, None]
    ours = np.asarray(filters.binary_threshold(img, thr))
    for t in range(3):
        _, ref = cv2.threshold(img[t], int(thr[t, 0, 0]), 255,
                               cv2.THRESH_BINARY)
        np.testing.assert_array_equal(ours[t], ref)


def test_morphology_matches_cv2(rng):
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    img = (rng.integers(0, 2, size=(33, 47), dtype=np.uint8)) * 255
    np.testing.assert_array_equal(
        np.asarray(filters.dilate3x3(img)), cv2.dilate(img, kernel))
    np.testing.assert_array_equal(
        np.asarray(filters.erode3x3(img)), cv2.erode(img, kernel))
    np.testing.assert_array_equal(
        np.asarray(filters.close3x3(img)),
        cv2.morphologyEx(img, cv2.MORPH_CLOSE, kernel))
    np.testing.assert_array_equal(
        np.asarray(filters.open3x3(img)),
        cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel))


def test_morphology_grayscale_matches_cv2(rng):
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    img = rng.integers(0, 256, size=(25, 25), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(filters.close3x3(img)),
        cv2.morphologyEx(img, cv2.MORPH_CLOSE, kernel))


def test_stack_median_device_path_matches_numpy(rng, monkeypatch):
    """The device median fast path must match np.median exactly for u8
    stacks (mean of two middle values at even T is exactly representable
    in f32 for u8 inputs)."""
    from metdetpy_tpu.ops import stack as stk
    frames = [rng.integers(0, 256, (37, 53, 3), np.uint8)
              for _ in range(12)]
    ref = np.median(frames, axis=0)
    monkeypatch.setattr(stk, "DEVICE_MEDIAN_MIN_ELEMS", 0)  # force device
    monkeypatch.setenv("METDETPY_TPU_DEVICE_MEDIAN", "force")  # skip probe
    got = stk.stack_median(frames)
    np.testing.assert_array_equal(ref, got)
    # odd count too
    ref = np.median(frames[:11], axis=0)
    got = stk.stack_median(frames[:11])
    np.testing.assert_array_equal(ref, got)


def test_host_median_bit_equals_np_median(rng):
    """_host_median (native-dtype partition, no float64-promoted sort)
    must be bit-equal to np.median for even/odd counts and u8/f32
    dtypes, including output dtype."""
    from metdetpy_tpu.ops.stack import _host_median
    for n in (11, 12):
        u8 = [rng.integers(0, 256, (23, 31, 3), np.uint8)
              for _ in range(n)]
        ref, got = np.median(u8, axis=0), _host_median(u8)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(ref, got)
        f32 = [rng.normal(size=(23, 31)).astype(np.float32)
               for _ in range(n)]
        ref, got = np.median(f32, axis=0), _host_median(f32)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(ref, got)
