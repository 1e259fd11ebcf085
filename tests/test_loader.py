"""Loader tests: exposure-time estimation on slow-shutter video, exposure
merging, block assembly, and recheck color stacks."""

import numpy as np

from metdetpy_tpu.io.videoloader import (BlockVideoLoader, ThreadVideoLoader,
                                         VanillaVideoLoader, rf_estimator)
from metdetpy_tpu.io.videowrapper import NumpyVideoWrapper


def _slow_shutter_video(n_exposures=60, exp_frames=3, h=32, w=48, seed=5):
    """Each exposure is held for exp_frames frames (plus tiny sensor noise
    per readout -- the slow-shutter pattern rf_estimator detects via
    frame-sum curvature)."""
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n_exposures):
        img = rng.integers(20, 200, (h, w)).astype(np.int16)
        for _ in range(exp_frames):
            frames.append(np.clip(img + rng.normal(0, 2, img.shape), 0,
                                  255).astype(np.uint8))
    return np.stack(frames)


def test_rf_estimator_detects_exposure_interval():
    frames = _slow_shutter_video(exp_frames=3)
    loader = VanillaVideoLoader(NumpyVideoWrapper, frames,
                                exp_option="real-time",
                                merge_func="max", grayscale=True)
    est = rf_estimator(loader)
    assert est == 3, est


def test_auto_exposure_sets_exp_frame():
    frames = _slow_shutter_video(exp_frames=4, n_exposures=50)
    loader = VanillaVideoLoader(NumpyVideoWrapper, frames, exp_option="auto",
                                exp_upper_bound=0.5, merge_func="max",
                                grayscale=True)
    # the reference estimator is deliberately conservative
    # (min(median, sigma-clipped mean)); sensor noise can split intervals,
    # so accept a one-frame underestimate
    assert 3 <= loader.exp_frame <= 5, loader.exp_frame


def test_block_loader_merges_exposures():
    frames = _slow_shutter_video(exp_frames=2, n_exposures=40)
    loader = BlockVideoLoader(NumpyVideoWrapper, frames, exp_option=2 / 25,
                              merge_func="max", grayscale=True,
                              block_frames=8)
    assert loader.exp_frame == 2
    loader.start()
    total = 0
    while True:
        blk = loader.pop_block()
        if blk is None:
            break
        assert blk.shape[1:] == frames.shape[1:]
        total += blk.shape[0]
    assert total == 40  # 80 raw frames -> 40 merged


def test_block_loader_color_stacks_cover_stream():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (48, 24, 32, 3), dtype=np.uint8)
    loader = BlockVideoLoader(NumpyVideoWrapper, frames,
                              exp_option="real-time", merge_func="max",
                              grayscale=True, keep_color_stacks=True,
                              block_frames=16)
    loader.start()
    while loader.pop_block() is not None:
        pass
    stack = loader.recheck_stack(0, 47)
    assert stack is not None and stack.shape == (24, 32, 3)
    # the stack is the max over covered chunks of *color* frames
    assert stack.max() >= frames.max() - 1


def test_thread_loader_pop_sequence():
    frames = np.arange(20, dtype=np.uint8)[:, None, None] * np.ones(
        (20, 8, 8), np.uint8)
    loader = ThreadVideoLoader(NumpyVideoWrapper, frames,
                               exp_option="real-time", merge_func="max",
                               grayscale=True)
    loader.start()
    seen = []
    for _ in range(loader.iterations):
        f = loader.pop()
        if f is None:
            break
        seen.append(int(f[0, 0]))
    assert seen == list(range(20))


def test_process_loader_matches_block_loader():
    """ProcessVideoLoader (subprocess decode + shared-memory block ring,
    reference MetLib/videoloader.py:634-793 analog) must deliver exactly
    the blocks the in-process BlockVideoLoader delivers."""
    from metdetpy_tpu.io.videoloader import ProcessVideoLoader
    frames = _slow_shutter_video(exp_frames=2, n_exposures=24)
    kw = dict(exp_option=2 / 25, merge_func="max", grayscale=True,
              block_frames=8)
    ref_loader = BlockVideoLoader(NumpyVideoWrapper, frames, **kw)
    ref_loader.start()
    ref_blocks = []
    while True:
        blk = ref_loader.pop_block()
        if blk is None:
            break
        ref_blocks.append(blk)
    ref_loader.release()

    loader = ProcessVideoLoader(NumpyVideoWrapper, frames, **kw)
    assert loader.exp_frame == 2
    loader.start()
    got_blocks = []
    while True:
        blk = loader.pop_block()
        if blk is None:
            break
        got_blocks.append(blk)
    loader.release()
    assert len(got_blocks) == len(ref_blocks)
    for a, b in zip(got_blocks, ref_blocks):
        np.testing.assert_array_equal(a, b)


def test_process_loader_color_stacks():
    from metdetpy_tpu.io.videoloader import ProcessVideoLoader
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (32, 24, 32, 3), dtype=np.uint8)
    loader = ProcessVideoLoader(NumpyVideoWrapper, frames,
                                exp_option="real-time", merge_func="max",
                                grayscale=True, keep_color_stacks=True,
                                block_frames=16)
    loader.start()
    while loader.pop_block() is not None:
        pass
    stack = loader.recheck_stack(0, 31)
    loader.release()
    assert stack is not None and stack.shape == (24, 32, 3)
    assert stack.max() >= frames.max() - 1


def test_device_preprocess_ops_bit_exact_with_cv2():
    """downscale2x_exact / bgr2gray_exact match cv2 bit-for-bit (the
    device-preprocess feed path must be indistinguishable from the host
    path)."""
    import cv2
    import numpy as np
    from metdetpy_tpu.ops.transforms import (bgr2gray_exact,
                                             downscale2x_exact)
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (4, 108, 192), np.uint8)
    out = np.asarray(downscale2x_exact(gray))
    for t in range(4):
        exp = cv2.resize(gray[t], (96, 54), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(out[t], exp)
    color = rng.integers(0, 256, (2, 64, 96, 3), np.uint8)
    outc = np.asarray(downscale2x_exact(color))
    for t in range(2):
        exp = cv2.resize(color[t], (48, 32), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(outc[t], exp)
    g = np.asarray(bgr2gray_exact(color))
    for t in range(2):
        np.testing.assert_array_equal(
            g[t], cv2.cvtColor(color[t], cv2.COLOR_BGR2GRAY))
    # composed (resize then gray), the HostPreprocess order
    from metdetpy_tpu.ops.transforms import make_block_preprocess
    fn = make_block_preprocess(True, True)
    comp = np.asarray(fn(color))
    for t in range(2):
        small = cv2.resize(color[t], (48, 32),
                           interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(
            comp[t], cv2.cvtColor(small, cv2.COLOR_BGR2GRAY))


def test_device_preproc_gate_conditions(monkeypatch):
    """The gate must engage only where the device preprocess is bit-exact:
    device_put mode, gray target, single exposure, linear interp, and a
    size that is the raw size or exactly half of it."""
    gray = np.zeros((8, 32, 48), np.uint8)

    def gate(**kw):
        kw.setdefault("exp_option", "real-time")
        kw.setdefault("merge_func", "max")
        kw.setdefault("grayscale", True)
        kw.setdefault("device_put", True)
        kw.setdefault("block_frames", 8)
        return BlockVideoLoader(NumpyVideoWrapper, gray,
                                **kw)._device_preproc_gate()

    assert gate(resize_option=[24, 16]) is True     # exact 2:1 -> downscale
    assert gate(resize_option=None) is False        # same size -> no scale
    assert gate(resize_option=[30, 20]) is None     # non-2:1 -> host path
    assert gate(resize_option=[24, 16], grayscale=False) is None
    assert gate(resize_option=[24, 16], keep_color_stacks=True) is None
    assert gate(resize_option=[24, 16], device_put=False) is None
    slow = _slow_shutter_video(exp_frames=2, n_exposures=8, h=32, w=48)
    assert BlockVideoLoader(
        NumpyVideoWrapper, slow, resize_option=[24, 16], exp_option=2 / 25,
        merge_func="max", grayscale=True, device_put=True,
        block_frames=8)._device_preproc_gate() is None  # merged exposures
    monkeypatch.setenv("METDETPY_TPU_DEVICE_PREPROC", "0")
    assert gate(resize_option=[24, 16]) is None     # env kill-switch


def test_threadloader_survives_stalled_consumer(monkeypatch):
    """A consumer stalled past PUT_TIMEOUT (device compiles take minutes)
    must NOT kill the decode thread / truncate the stream: the put
    retries with backpressure until the loader stops."""
    from metdetpy_tpu.io import videoloader as vl
    monkeypatch.setattr(vl, "PUT_TIMEOUT", 0.05)
    frames = np.arange(12, dtype=np.uint8).reshape(12, 1, 1) \
        * np.ones((12, 8, 8), np.uint8)
    ld = ThreadVideoLoader(NumpyVideoWrapper, frames, maxsize=1,
                           exp_option="real-time", merge_func="max",
                           grayscale=True)
    ld.start()
    got = []
    import time as _t
    for i in range(12):
        if i == 2:
            _t.sleep(0.5)  # 10x the patched PUT_TIMEOUT
        frame = ld.pop()
        assert frame is not None
        got.append(int(frame[0, 0]))
    ld.stop()
    assert got == list(range(12))


def test_transport_aware_preproc_placement(monkeypatch):
    """Auto mode keeps the 4x raw-block upload only when the measured
    link absorbs the extra bytes faster than the host can resize; a slow
    tunnel falls back to host preprocess, and `force` skips the probe."""
    from metdetpy_tpu.io import videoloader as vl
    gray = np.zeros((8, 32, 48), np.uint8)

    def loader(**kw):
        return BlockVideoLoader(
            NumpyVideoWrapper, gray, resize_option=[24, 16],
            exp_option="real-time", merge_func="max", grayscale=True,
            device_put=True, block_frames=8, **kw)

    # fast link (10 GB/s), slow host resize (5 ms) -> device preprocess
    monkeypatch.setattr(vl, "_probe_h2d_bps", lambda rh, rw: 10e9)
    monkeypatch.setattr(vl, "_probe_host_resize_s",
                        lambda rh, rw, w, h: 5e-3)
    ld = loader()
    assert ld._transport_prefers_device_preproc(True) is True
    assert ld.stage_stats["preproc_probe"]["device_preproc"] is True

    # slow tunnel (20 MB/s): extra (32*48-24*16)=1152 B -> 57.6 us... use
    # a realistic 1080p-scale penalty by probing with raw-size numbers:
    # extra bytes / bw must exceed host resize time to flip the choice
    monkeypatch.setattr(vl, "_probe_h2d_bps", lambda rh, rw: 20e3)
    ld2 = loader()
    assert ld2._transport_prefers_device_preproc(True) is False
    assert ld2.stage_stats["preproc_probe"]["device_preproc"] is False

    # equal raw/runtime size: no extra bytes, no probe needed
    probe_called = []
    monkeypatch.setattr(vl, "_probe_h2d_bps",
                        lambda rh, rw: probe_called.append(1) or 1e9)
    assert loader()._transport_prefers_device_preproc(False) is True
    # force: probe skipped even at 2:1
    monkeypatch.setenv("METDETPY_TPU_DEVICE_PREPROC", "force")
    assert loader()._transport_prefers_device_preproc(True) is True
    assert not probe_called


def test_device_preproc_color_source_falls_back(monkeypatch):
    """A color SOURCE must fall back to the host-preprocess loop (raw
    color uploads would cost 12x the processed bytes) and still produce
    the exact host-path stream."""
    monkeypatch.setenv("METDETPY_TPU_DEVICE_PREPROC", "1")
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (24, 32, 48, 3), dtype=np.uint8)

    def stream(device_put: bool):
        loader = BlockVideoLoader(
            NumpyVideoWrapper, frames, resize_option=[24, 16],
            exp_option="real-time", merge_func="max", grayscale=True,
            device_put=device_put, block_frames=8)
        loader.start()
        out = []
        while True:
            item = loader.pop_block()
            if item is None:
                break
            if device_put:
                dev, n_real = item
                out.append(np.asarray(dev)[:n_real])
            else:
                out.append(np.asarray(item))
        return np.concatenate(out)

    np.testing.assert_array_equal(stream(True), stream(False))


def test_device_preprocess_e2e_equals_host_path(monkeypatch):
    """detect_video over a 2:1-downscaled gray source produces identical
    results whether the preprocess runs on device (raw-block uploads) or
    on host (the fused native path)."""
    import numpy as np
    from metdetpy_tpu.api import detect_video
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
    from metdetpy_tpu.utils import relative2abs_path
    W, H, FPS = 512, 288, 25.0
    frames = generate_meteor_video(
        width=W, height=H, fps=FPS, duration_sec=4.0,
        meteors=[SynthMeteor(1.0, 2.2, (int(W * .7), int(H * .3)),
                             (int(W * .35), int(H * .7)))],
        n_stars=40, noise_sigma=3.0, seed=9)

    def run(dev_pre: str):
        monkeypatch.setenv("METDETPY_TPU_DEVICE_PREPROC", dev_pre)
        cfg = MainDetectCfg.from_json_file(
            relative2abs_path("./config/m3det_normal.json"))
        cfg.loader.name = "BlockVideoLoader"
        cfg.loader.wrapper = "NumpyVideoWrapper"
        cfg.loader.resize = W // 2   # exact 2:1
        cfg.loader.exp_time = "real-time"
        cfg.collector.recheck_cfg.switch = False
        return detect_video(frames, None, cfg, work_mode="backend")

    on = run("force")   # pin device placement (auto probes the transport)
    off = run("0")
    assert [r.to_dict() for r in on.results] \
        == [r.to_dict() for r in off.results]
    assert any(t.category == "METEOR"
               for r in on.results for t in r.target)


def test_native_assemble_probe_gate(monkeypatch):
    """The start-time assembler probe (fused-C chunk assembly vs cv2's
    SIMD per-frame kernels) must honor env pins, cache its measurement,
    and return a bool either way. Both paths are cv2-bit-exact, so the
    choice never changes results (pinned below)."""
    from metdetpy_tpu.io import videoloader as vl
    vl._ASSEMBLE_PROBE_CACHE.clear()
    monkeypatch.setenv("METDETPY_TPU_NATIVE_ASSEMBLE", "1")
    assert vl._native_assemble_wins((64, 96), (32, 48)) is True
    monkeypatch.setenv("METDETPY_TPU_NATIVE_ASSEMBLE", "0")
    assert vl._native_assemble_wins((64, 96), (32, 48)) is False
    monkeypatch.delenv("METDETPY_TPU_NATIVE_ASSEMBLE")
    r = vl._native_assemble_wins((64, 96, 3), (32, 48))
    assert isinstance(r, bool)
    assert vl._ASSEMBLE_PROBE_CACHE[((64, 96, 3), (32, 48))] == r


def test_assemble_choice_is_bit_exact(monkeypatch):
    """Pinning the assembler either way must produce identical block
    streams (gray and color sources, with exposure merge)."""
    rng = np.random.default_rng(3)

    def stream(frames, grayscale):
        loader = BlockVideoLoader(
            NumpyVideoWrapper, frames, resize_option=[24, 16],
            exp_option=2 / 25, merge_func="max", grayscale=grayscale,
            block_frames=8)
        loader.start()
        out = []
        while True:
            blk = loader.pop_block()
            if blk is None:
                break
            out.append(np.asarray(blk).copy())
        loader.stop()
        return np.concatenate(out)

    for frames, grayscale in (
            (rng.integers(0, 255, (24, 32, 48), dtype=np.uint8), True),
            (rng.integers(0, 255, (24, 32, 48, 3), dtype=np.uint8), True),
            (rng.integers(0, 255, (24, 32, 48, 3), dtype=np.uint8), False)):
        monkeypatch.setenv("METDETPY_TPU_NATIVE_ASSEMBLE", "1")
        a = stream(frames, grayscale)
        monkeypatch.setenv("METDETPY_TPU_NATIVE_ASSEMBLE", "0")
        b = stream(frames, grayscale)
        np.testing.assert_array_equal(a, b)


def test_process_loader_color_source_resize():
    """Color source frames + resize through the subprocess worker's
    into()-based allocation-free hot path must match the in-process
    BlockVideoLoader exactly."""
    from metdetpy_tpu.io.videoloader import ProcessVideoLoader
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (24, 32, 48, 3), dtype=np.uint8)
    kw = dict(resize_option=[24, 16], exp_option=2 / 25, merge_func="max",
              grayscale=True, block_frames=8)

    def run(cls):
        loader = cls(NumpyVideoWrapper, frames, **kw)
        loader.start()
        out = []
        while True:
            blk = loader.pop_block()
            if blk is None:
                break
            out.append(np.asarray(blk).copy())
        loader.release()
        return np.concatenate(out)

    np.testing.assert_array_equal(run(ProcessVideoLoader),
                                  run(BlockVideoLoader))
