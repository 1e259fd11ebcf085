"""Stacker semantics pins: the in-place FastGaussianContainer and the
f32 MFNR pixel-math must match the straightforward float64 / object-
algebra formulations they replaced (reference MetLib/stacker.py:296-403,
MetLib/utils.py:418-513)."""

import cv2
import numpy as np

from metdetpy_tpu.io.videoloader import ThreadVideoLoader
from metdetpy_tpu.io.videowrapper import NumpyVideoWrapper
from metdetpy_tpu.ops import stack as stk
from metdetpy_tpu.structs import ClipCfg
from metdetpy_tpu.utils import relative2abs_path


def _frames(rng, n=16, h=96, w=128):
    frames = rng.integers(0, 60, (n, h, w, 3), np.uint8)
    for t in range(4, min(12, n)):  # a moving streak (foreground)
        p = (10 + 8 * (t - 4), 20 + 5 * (t - 4))
        cv2.line(frames[t], p, (p[0] + 12, p[1] + 8), (250, 250, 250), 2)
    return frames


def test_fast_gaussian_container_bit_equals_object_chain(rng):
    """In-place streaming accumulation == the per-frame FastGaussianParam
    __add__ chain it replaced (same u16 sum / u32 square-sum dtypes)."""
    frames = _frames(rng, n=9)
    cont = stk.FastGaussianContainer()
    chain = None
    for f in frames:
        cont.append(f)
        fg = stk.FastGaussianParam(f.astype(np.uint16))
        chain = fg if chain is None else chain + fg
    got = cont.export()
    assert got.sum_mu.dtype == chain.sum_mu.dtype
    assert got.square_sum.dtype == chain.square_sum.dtype
    np.testing.assert_array_equal(got.sum_mu, chain.sum_mu)
    np.testing.assert_array_equal(got.square_sum, chain.square_sum)
    np.testing.assert_array_equal(np.broadcast_to(got.n, chain.n.shape),
                                  chain.n)
    np.testing.assert_array_equal(got.mu, chain.mu)
    np.testing.assert_array_equal(got.var, chain.var)


def test_var_f32_matches_f64_property(rng):
    frames = _frames(rng, n=12)
    cont = stk.FastGaussianContainer()
    for f in frames:
        cont.append(f)
    fg = cont.export()
    v32, v64 = stk._var_f32(fg), fg.var
    assert (v32 >= 0).all()
    np.testing.assert_allclose(v32, v64, rtol=1e-4, atol=1e-2)


def test_sigma_clipping_bit_equals_object_chain(rng):
    """Streamed single_sigma_clipping == the per-frame masked
    FastGaussianParam chain it replaced."""
    frames = _frames(rng, n=10)
    cont = stk.FastGaussianContainer()
    for f in frames:
        cont.append(f)
    full = cont.export()
    got = stk.single_sigma_clipping(list(frames), full, 2.0, 2.0)

    mu, std = full.mu, np.sqrt(full.var)
    hi = np.round(mu + 2.0 * std).clip(0, 255).astype(np.uint8)
    lo = np.round(mu - 2.0 * std).clip(0, 255).astype(np.uint8)
    chain = None
    for img in frames:
        fgp = stk.FastGaussianParam(img.astype(np.uint16))
        fgp.mask((img > hi) | (img < lo))
        chain = fgp if chain is None else chain + fgp
    want = full - chain
    np.testing.assert_array_equal(got.sum_mu, want.sum_mu)
    np.testing.assert_array_equal(got.square_sum, want.square_sum)
    np.testing.assert_array_equal(got.n, want.n)


def test_simple_denoise_matches_f64_reference(rng):
    """Production simple_denoise (f32, single-channel mask) vs its f64
    formulation: |diff| <= 1 gray level on a tiny fraction of pixels."""
    frames = _frames(rng)
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    max_img = frames.max(axis=0)
    from metdetpy_tpu.log import BaseMetLog
    got = stk.simple_denoise(max_img, dn, BaseMetLog())

    hp, blur_ksize = dn.highlight_preserve, dn.blur_ksize
    simple, connect_cfg = dn.simple_param, dn.connect_lines
    est_bg = stk.dust_and_scratches(max_img, radius=simple.ds_radius,
                                    threshold=simple.ds_threshold)
    max_diff = max_img.astype(np.float64) - est_bg
    pos = max_diff[max_diff > 0]
    highlight_avg = np.average(pos) if pos.size else 0.0
    fg_mask = (max_diff > highlight_avg) | (max_img > 255 * hp)
    fg_mask = np.repeat((np.sum(fg_mask.astype(np.uint8), axis=-1)
                         >= 1)[..., None], 3, axis=-1).astype(float)
    fg_blur = cv2.GaussianBlur(fg_mask, ksize=(blur_ksize, blur_ksize),
                               sigmaX=3)
    cp_max = np.asarray(max_img)
    if connect_cfg.switch:
        star_filter = stk.circular_kernel(3)
        filtered_diff = cv2.morphologyEx(max_diff, cv2.MORPH_OPEN,
                                         star_filter)
        cp_max = stk.connect_highlight_area(
            cp_max, filtered_diff, rep_times=1,
            ksize_multiplier=connect_cfg.ksize_multiplier,
            clip_threshold=connect_cfg.threshold, gamma=connect_cfg.gamma)
    bg = cv2.bilateralFilter(max_img, d=simple.bi_d,
                             sigmaColor=simple.bi_sigma_color,
                             sigmaSpace=simple.bi_sigma_space)
    want = (fg_blur * cp_max + (1 - fg_blur) * bg).astype(np.uint8)
    diff = got.astype(np.int16) - want.astype(np.int16)
    assert np.abs(diff).max() <= 1
    # the diffs are truncation artifacts of the round-free
    # astype(uint8): the Gaussian kernel tail yields ~1e-9 weights
    # instead of exact 0, dragging integer-valued pixels to k-1e-9
    # which truncates to k-1 -- in whichever precision the epsilon
    # lands. Either result is within the formulation's own noise.
    assert (diff != 0).mean() < 0.10


def _mfnr_reference_f64(frames, denoise_cfg):
    """The float64 / 3-channel-mask formulation of mfnr-mix (what the
    production f32 single-channel path replaced), bg_algorithm=mean."""
    hp = denoise_cfg.highlight_preserve
    blur_ksize = denoise_cfg.blur_ksize
    connect_cfg = denoise_cfg.connect_lines
    mfnr = denoise_cfg.mfnr_param
    max_img = frames.max(axis=0)
    fg = None
    for f in frames:
        p = stk.FastGaussianParam(f.astype(np.uint16))
        fg = p if fg is None else fg + p
    est_bg_mu = fg.mu
    est_bg_var = float(np.mean(np.sqrt(fg.var)))
    gumbel_mean = stk.get_gumbel_mean(len(frames))
    expect_max = est_bg_mu + est_bg_var * gumbel_mean * mfnr.bg_fix_factor
    max_bias = max_img.astype(np.float64) - expect_max
    pos = max_bias[max_bias > 0]
    highlight_avg = np.average(pos) if pos.size else 0.0
    fg_mask = (max_bias > highlight_avg) | (max_img > 255 * hp)
    fg_mask = np.repeat((np.sum(fg_mask.astype(np.uint8), axis=-1)
                         >= 1)[..., None], 3, axis=-1).astype(float)
    fg_blur = cv2.GaussianBlur(fg_mask, ksize=(blur_ksize, blur_ksize),
                               sigmaX=3)
    if connect_cfg.switch:
        max_img = stk.connect_highlight_area(
            max_img, max_bias, rep_times=1,
            ksize_multiplier=connect_cfg.ksize_multiplier,
            clip_threshold=connect_cfg.threshold, gamma=connect_cfg.gamma)
    fix_factor = 1 - ((max_img / 255 - hp).clip(0, 1) / (1 - hp))
    fixed_max = np.clip(max_img.astype(np.float64)
                        - est_bg_var * gumbel_mean * fix_factor, 0, 255)
    return np.round(fixed_max * fg_blur
                    + est_bg_mu * (1 - fg_blur)).astype(np.uint8)


def test_mfnr_mix_matches_f64_reference(rng):
    """Production mfnr-mix (f32, single-channel blurred mask) vs the f64
    reference formulation: off only by float-rounding at .5 boundaries
    (|diff| <= 1 gray level, and only on a tiny fraction of pixels)."""
    frames = _frames(rng)
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    dn.algorithm = "mfnr-mix"
    assert dn.mfnr_param.bg_algorithm == "mean"
    loader = ThreadVideoLoader(NumpyVideoWrapper, frames,
                               exp_option="real-time", merge_func="max",
                               grayscale=False)
    got = stk.mfnr_mix_stacker(loader, dn)
    want = _mfnr_reference_f64(frames, dn)
    assert got.shape == want.shape and got.dtype == want.dtype
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def _loader(frames):
    return ThreadVideoLoader(NumpyVideoWrapper, frames,
                             exp_option="real-time", merge_func="max",
                             grayscale=False)


def test_mfnr_device_matches_host_all_bg_algorithms(rng, monkeypatch):
    """Device MFNR (ops.stack_device, jitted [T,H,W,3] programs) vs the
    host path: within +/-1 gray level for every bg algorithm (f32 vs f64
    reductions land on different sides of .5 boundaries only)."""
    from metdetpy_tpu.ops.stack_device import mfnr_mix_device

    frames = _frames(rng, n=18)
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    dn.algorithm = "mfnr-mix"
    for bg in ("mean", "median", "sigma-clipping", "med-of-med"):
        dn.mfnr_param.bg_algorithm = bg
        monkeypatch.setenv("METDETPY_TPU_DEVICE_DENOISE", "0")
        want = stk.mfnr_mix_stacker(_loader(frames), dn)
        got = mfnr_mix_device(_loader(frames), dn)
        assert got is not None and want is not None
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, (bg, diff.max())
        assert (diff > 0).mean() < 0.02, (bg, (diff > 0).mean())


def test_mfnr_device_host_reduced_upload_parity(rng, monkeypatch):
    """The host-reduced placement for bg="mean" (stream max/sum/sqsum on
    host, fold sum/sqsum to the rounded-mean u8 plane + scalar bg std,
    upload only max+mu, pixel math on device) must match the full-upload
    device path within +/-1 gray level: the mu plane is bit-equal (same
    f32 divide + round-half-even ops on both sides); only the scalar bg
    std differs by reduction-order ULPs, which can flip isolated pixels
    across a round boundary."""
    from metdetpy_tpu.ops import stack_device
    from metdetpy_tpu.ops.stack_device import mfnr_mix_device

    frames = _frames(rng, n=18)
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    dn.algorithm = "mfnr-mix"
    dn.mfnr_param.bg_algorithm = "mean"
    monkeypatch.setenv("METDETPY_TPU_MFNR_HOST_REDUCE", "0")
    full = mfnr_mix_device(_loader(frames), dn)
    assert stack_device.last_run_stats["placement"] == "full-upload"
    monkeypatch.setenv("METDETPY_TPU_MFNR_HOST_REDUCE", "1")
    reduced = mfnr_mix_device(_loader(frames), dn)
    assert stack_device.last_run_stats["placement"] == \
        "host-reduced-upload"
    # u8 max + u8 mu + single-channel u8 fg mask = 2 1/3 u8 color
    # frames, frame-count-free (the full-upload path ships
    # n_frames x frame bytes instead)
    assert stack_device.last_run_stats["h2d_bytes"] == \
        2 * frames[0].nbytes + frames[0].nbytes // 3
    diff = np.abs(reduced.astype(np.int16) - full.astype(np.int16))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.02


def test_mfnr_device_no_connect_lines(rng, monkeypatch):
    """connect_lines off: the device path must run as ONE program chain
    with no host round trip, same +/-1 parity."""
    from metdetpy_tpu.ops.stack_device import mfnr_mix_device

    frames = _frames(rng, n=12)
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    dn.algorithm = "mfnr-mix"
    dn.connect_lines.switch = False
    monkeypatch.setenv("METDETPY_TPU_DEVICE_DENOISE", "0")
    want = stk.mfnr_mix_stacker(_loader(frames), dn)
    got = mfnr_mix_device(_loader(frames), dn)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1


def test_mfnr_device_fg_window_crop(rng, monkeypatch):
    """Sparse foreground: the host-reduced device blend ships only the
    fg bounding-box window (+blur radius, padded to 64) and composites
    onto the mu plane -- outside the feathered fg support the blend is
    bit-exactly round(mu) == mu, so the windowed output must match the
    host path the same way the full-frame device path does (+/-1)."""
    from metdetpy_tpu.ops import stack_device
    from metdetpy_tpu.ops.stack_device import mfnr_mix_device

    # quiet background (low noise, low amplitude) + one small bright
    # blob: fg collapses to a tiny bbox
    frames = rng.integers(0, 12, (16, 192, 256, 3), np.uint8)
    frames[5:9, 40:48, 60:70] = 250
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    dn.algorithm = "mfnr-mix"
    dn.mfnr_param.bg_algorithm = "mean"
    monkeypatch.setenv("METDETPY_TPU_DEVICE_DENOISE", "0")
    want = stk.mfnr_mix_stacker(_loader(frames), dn)
    monkeypatch.delenv("METDETPY_TPU_DEVICE_DENOISE")
    monkeypatch.setenv("METDETPY_TPU_MFNR_HOST_REDUCE", "1")
    got = mfnr_mix_device(_loader(frames), dn)
    frac = stack_device.last_run_stats["window_px_frac"]
    assert 0.0 < frac < 0.5, frac
    # windowed upload is a fraction of the 2.33 B/px full-frame planes
    assert stack_device.last_run_stats["h2d_bytes"] < \
        frames[0].nbytes * 2.34 * 0.5
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.02


def test_mfnr_device_fg_window_empty_fg(rng, monkeypatch):
    """No foreground at all: the blend degenerates to the mu plane with
    zero device traffic."""
    from metdetpy_tpu.ops import stack_device
    from metdetpy_tpu.ops.stack_device import mfnr_mix_device

    frames = np.full((12, 64, 96, 3), 40, np.uint8)
    dn = ClipCfg.from_json_file(
        relative2abs_path("./global/clip_cfg.json")).image_denoise
    dn.algorithm = "mfnr-mix"
    dn.mfnr_param.bg_algorithm = "mean"
    monkeypatch.setenv("METDETPY_TPU_DEVICE_DENOISE", "0")
    want = stk.mfnr_mix_stacker(_loader(frames), dn)
    monkeypatch.delenv("METDETPY_TPU_DEVICE_DENOISE")
    monkeypatch.setenv("METDETPY_TPU_MFNR_HOST_REDUCE", "1")
    got = mfnr_mix_device(_loader(frames), dn)
    assert stack_device.last_run_stats["h2d_bytes"] == 0
    np.testing.assert_array_equal(got, want)
