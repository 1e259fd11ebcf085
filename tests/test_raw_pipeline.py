"""RAW-pipeline math tests (reference MetLib/fileio.py:142-202 and
MetLib/imgproc.py:17-67): the gamma normalize / contrast stretch / u16->u8
steps are pure numpy+cv2 and unit-testable without rawpy; the rawpy decode
itself is covered with a recording mock (LibRaw absent in-image).
"""

import os
import sys
import types

import cv2
import numpy as np
import pytest

from metdetpy_tpu.io.fileio import (contrast_stretch_uint8,
                                    contrast_stretch_uint16, scale2tgt_mean)

UINT16_MAX = 65535


def test_scale2tgt_mean_uniform_exact():
    """Uniform linear image: closed-form output is target^(1) * 65535.

    gray_mean = v; k = target^power / v; (k*v)^(1/power) = target, so
    every pixel maps to floor(target * 65535)."""
    img = np.full((8, 8, 3), 1000, np.uint16)
    out = scale2tgt_mean(img, power=2.222, target_nl_mean=0.3)
    assert out.dtype == np.uint16
    assert np.all(out == int(0.3 * UINT16_MAX))  # 19660


def test_scale2tgt_mean_hits_target_mean():
    """Non-uniform linear input: the gamma-mapped gray mean lands near the
    requested target (exact for the mean of the scaled gray, approximate
    per-channel because the gray projection is not the identity)."""
    rng = np.random.default_rng(3)
    img = rng.integers(200, 4000, (64, 64, 3)).astype(np.uint16)
    power, target = 2.222, 0.3
    out = scale2tgt_mean(img, power=power, target_nl_mean=target)
    # recompute the mapping independently
    gray_mean = np.mean(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY))
    k = target ** power / gray_mean
    expected = ((k * img) ** (1 / power) * UINT16_MAX).clip(
        0, UINT16_MAX).astype(np.uint16)
    np.testing.assert_array_equal(out, expected)
    # and the nonlinear gray mean is in the target's neighbourhood
    nl_gray = cv2.cvtColor(out, cv2.COLOR_BGR2GRAY).mean() / UINT16_MAX
    assert abs(nl_gray - target) < 0.05


def test_scale2tgt_mean_clips_highlights():
    """Pixels whose scaled value exceeds 1.0 clip to UINT16_MAX instead of
    wrapping."""
    img = np.full((4, 4, 3), 10, np.uint16)
    img[0, 0] = 60000  # extreme highlight vs a dark mean
    out = scale2tgt_mean(img, power=2.222, target_nl_mean=0.9)
    assert out[0, 0, 0] == UINT16_MAX
    assert out.max() == UINT16_MAX


def test_contrast_stretch_uint16_uniform_is_identity():
    """L == L_mean everywhere -> the stretch is a no-op up to LAB
    round-trip rounding."""
    img = np.full((8, 8, 3), 30000, np.uint16)
    out = contrast_stretch_uint16(img, alpha=1.2)
    assert out.dtype == np.uint16
    assert np.abs(out.astype(int) - 30000).max() <= 90  # ~0.1% of range


def test_contrast_stretch_uint16_expands_about_mean():
    """alpha > 1 pushes L below the mean down and above the mean up."""
    img = np.empty((8, 8, 3), np.uint16)
    img[:4] = 15000   # dark half
    img[4:] = 45000   # bright half
    out = contrast_stretch_uint16(img, alpha=1.5)
    assert out[:4].mean() < img[:4].mean()
    assert out[4:].mean() > img[4:].mean()
    # alpha=1 is identity up to LAB round-trip
    out1 = contrast_stretch_uint16(img, alpha=1.0)
    assert np.abs(out1.astype(int) - img.astype(int)).max() <= 90


def test_contrast_stretch_uint8_matches_reference_formula():
    """uint8 variant against an independent recomputation of the
    reference's LAB math (MetLib/imgproc.py:51-67)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    alpha = 1.2
    out = contrast_stretch_uint8(img, alpha=alpha)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
    L, a, b = cv2.split(lab)
    L_mean = L.mean()
    L2 = np.clip((L - L_mean) * alpha + L_mean, 0, 255).astype(np.uint8)
    expected = cv2.cvtColor(cv2.merge([L2, a, b]), cv2.COLOR_LAB2BGR)
    np.testing.assert_array_equal(out, expected)
    assert out.dtype == np.uint8


def test_u16_to_u8_conversion():
    """The 8-bit output path divides by 257 (65535/255), mapping full
    scale to full scale (reference MetLib/fileio.py:198)."""
    img = np.array([0, 257, 65535, 32896], np.uint16)
    out = (img // 257).astype(np.uint8)
    np.testing.assert_array_equal(out, [0, 1, 255, 128])


def test_debayer_preprocess_matches_cv2():
    """HostPreprocess debayer path (gray mosaic -> BGGR demosaic) equals
    the direct cv2 calls it wraps (reference MetLib/imgproc.py:123-127)."""
    from metdetpy_tpu.io.videoloader import HostPreprocess
    rng = np.random.default_rng(11)
    mosaic3 = rng.integers(0, 255, (16, 16, 3), np.uint8)
    pre = HostPreprocess(raw_size=[16, 16], runtime_size=[16, 16],
                         grayscale=False, debayer=True,
                         debayer_pattern="BGGR", mask=None, masked=False)
    out = pre(mosaic3)
    gray = cv2.cvtColor(mosaic3, cv2.COLOR_BGR2GRAY)
    expected = cv2.cvtColor(gray, cv2.COLOR_BAYER_BGGR2BGR)
    np.testing.assert_array_equal(out, expected)


class _FakeRaw:
    def __init__(self, record):
        self.record = record

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def postprocess(self, **kwargs):
        self.record.append(kwargs)
        rng = np.random.default_rng(0)
        return rng.integers(100, 3000, (24, 32, 3)).astype(np.uint16)  # RGB


@pytest.fixture
def mock_rawpy(monkeypatch, tmp_path):
    calls = []
    mod = types.ModuleType("rawpy")
    mod.imread = lambda path: _FakeRaw(calls)
    inner = types.ModuleType("rawpy.rawpy")
    inner.ColorSpace = lambda v: f"colorspace-{v}"
    mod.rawpy = inner
    monkeypatch.setitem(sys.modules, "rawpy", mod)
    fake = tmp_path / "shot.CR2"
    fake.write_bytes(b"not-a-real-raw")
    return str(fake), calls


def test_load_raw_with_preprocess_mocked(mock_rawpy):
    """Full RAW flow on a mocked decoder: linear decode args (gamma (1,0),
    16-bit, auto wb), scale -> stretch, both output depths."""
    from metdetpy_tpu.io.fileio import load_raw_with_preprocess
    path, calls = mock_rawpy
    out16 = load_raw_with_preprocess(path, output_bps=16)
    assert out16.dtype == np.uint16 and out16.shape == (24, 32, 3)
    assert calls[-1]["gamma"] == (1.0, 0.0)
    assert calls[-1]["output_bps"] == 16
    assert calls[-1]["no_auto_bright"] is True
    assert calls[-1]["use_auto_wb"] is True  # preprocess path forces auto wb
    out8 = load_raw_with_preprocess(path, output_bps=8)
    assert out8.dtype == np.uint8 and out8.shape == (24, 32, 3)


def test_load_raw_image_auto_gamma_args(mock_rawpy):
    """auto_gamma decode requests the camera-gamma path with sRGB-like
    output color space instead of linear."""
    from metdetpy_tpu.io.fileio import load_raw_image
    path, calls = mock_rawpy
    out = load_raw_image(path, auto_gamma=True, auto_wb=False)
    assert out.dtype == np.uint16
    assert "gamma" not in calls[-1]
    assert calls[-1]["output_color"] == "colorspace-4"
    assert calls[-1]["use_camera_wb"] is True


def test_load_image_file_dispatches_raw(mock_rawpy):
    """load_image_file routes .CR2 through the RAW pipeline using the
    config's parameters (reference MetLib/fileio.py:205-247)."""
    from metdetpy_tpu.io.fileio import load_image_file
    from metdetpy_tpu.structs import RawImgLoadCfg
    path, calls = mock_rawpy
    cfg = RawImgLoadCfg(power=2.0, target_nl_mean=0.25, contrast_alpha=1.1,
                        output_bps=8)
    out = load_image_file(path, cfg=cfg)
    assert out is not None and out.dtype == np.uint8
    assert calls[-1]["gamma"] == (1.0, 0.0)


class _FakeImageData:
    """Recording pyexiv2.ImageData mock."""
    instances = []

    def __init__(self, data):
        self.data = data
        self.icc = None
        _FakeImageData.instances.append(self)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def modify_icc(self, profile):
        self.icc = profile

    def get_bytes(self):
        return self.data


def test_save_img_embeds_srgb_icc(monkeypatch, tmp_path):
    """save_img with color_space='sRGB' must embed resource/sRGB.icc via
    pyexiv2 (reference MetLib/fileio.py:85-131). Uses the generated
    minimal sRGB profile (tools/make_srgb_icc.py) and a pyexiv2 mock."""
    import struct

    from metdetpy_tpu.io.fileio import _color_profile_path, save_img

    profile_path = _color_profile_path("sRGB")
    assert os.path.isfile(profile_path), profile_path
    profile = open(profile_path, "rb").read()
    # the vendored profile is structurally valid ICC
    assert profile[36:40] == b"acsp"
    assert struct.unpack(">I", profile[:4])[0] == len(profile)

    mod = types.ModuleType("pyexiv2")
    mod.ImageData = _FakeImageData
    monkeypatch.setitem(sys.modules, "pyexiv2", mod)
    _FakeImageData.instances.clear()

    out = str(tmp_path / "stack.jpg")
    img = np.full((16, 16, 3), 128, np.uint8)
    save_img(img, out, quality=95, compressing=3, color_space="sRGB")
    assert os.path.getsize(out) > 0
    (inst,) = _FakeImageData.instances
    assert inst.icc == profile  # the exact profile bytes were embedded


def test_save_img_without_pyexiv2_degrades(monkeypatch, tmp_path):
    """pyexiv2 absent -> plain write, no crash."""
    from metdetpy_tpu.io.fileio import save_img
    monkeypatch.setitem(sys.modules, "pyexiv2", None)
    out = str(tmp_path / "stack.png")
    save_img(np.zeros((8, 8, 3), np.uint8), out, quality=95, compressing=3,
             color_space="sRGB")
    assert os.path.getsize(out) > 0
