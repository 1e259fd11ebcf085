"""Native (C++) bilinear resize + chunk assembly vs cv2 golden outputs.

The loader's hot path assembles blocks through ONE GIL-free native call
per decode chunk (metring_resize_assemble_u8); correctness bar is
BIT-exact agreement with cv2.resize INTER_LINEAR for every downscale
(the only case the pipeline hits -- runtime size <= raw size).
"""

import cv2
import numpy as np
import pytest

from metdetpy_tpu.native import (get_lib, resize_assemble_u8,
                                 resize_linear_u8)

DOWNSCALES = [(1080, 1920, 540, 960), (655, 1168, 538, 960),
              (720, 1280, 540, 960), (480, 640, 270, 360),
              (100, 173, 37, 61), (540, 960, 540, 960),
              (2160, 3840, 540, 960),
              # exact 2:1 ratios take the fused AVX2 half-resize fast
              # path (metring.cpp resize_half_u8) incl. non-multiple-of-
              # 32 widths exercising the 16-wide and scalar tails
              (2160, 3840, 1080, 1920), (540, 1918, 270, 959),
              (100, 70, 50, 35), (8, 34, 4, 17)]


@pytest.mark.parametrize("sh,sw,dh,dw", DOWNSCALES)
def test_resize_bit_exact_vs_cv2(rng, sh, sw, dh, dw):
    src = rng.integers(0, 256, (sh, sw), np.uint8)
    ref = cv2.resize(src, (dw, dh), interpolation=cv2.INTER_LINEAR)
    got = resize_linear_u8(src, (dw, dh))
    np.testing.assert_array_equal(ref, got)


def test_resize_into_destination_buffer(rng):
    src = rng.integers(0, 256, (200, 320), np.uint8)
    dst = np.zeros((100, 160), np.uint8)
    out = resize_linear_u8(src, (160, 100), dst=dst)
    assert out is dst
    np.testing.assert_array_equal(
        dst, cv2.resize(src, (160, 100), interpolation=cv2.INTER_LINEAR))


def test_assemble_with_exposure_merge(rng):
    frames = [rng.integers(0, 256, (200, 320), np.uint8) for _ in range(8)]
    block = np.zeros((4, 100, 160), np.uint8)
    n = resize_assemble_u8(frames, block, 0, exp_frame=2)
    assert n == 4
    ref = np.stack([
        np.maximum(
            cv2.resize(frames[2 * i], (160, 100),
                       interpolation=cv2.INTER_LINEAR),
            cv2.resize(frames[2 * i + 1], (160, 100),
                       interpolation=cv2.INTER_LINEAR))
        for i in range(4)])
    np.testing.assert_array_equal(block, ref)


def test_assemble_offset_and_identity(rng):
    frames = [rng.integers(0, 256, (64, 96), np.uint8) for _ in range(3)]
    block = np.zeros((5, 64, 96), np.uint8)
    n = resize_assemble_u8(frames, block, 2, exp_frame=1)
    assert n == 3
    for i in range(3):
        np.testing.assert_array_equal(block[2 + i], frames[i])
    assert block[0].max() == 0 and block[1].max() == 0


def test_native_lib_loaded():
    """The native library must build/load in this image (g++ available);
    the numpy fallbacks are for degraded installs only."""
    assert get_lib() is not None
