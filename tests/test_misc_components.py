"""Coverage for remaining components: ClassicDetector end-to-end, visu
record rendering, detect_multi_stream convenience API, native kernels."""

import numpy as np
import pytest

from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path

W, H, FPS = 192, 108, 25.0


def test_classic_detector_e2e():
    import os
    os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")
    from metdetpy_tpu.api import detect_video
    # the uzanka 4-frame algorithm's design regime is SLOW-SHUTTER
    # footage: the suppression mask comes from the NEWEST frame pair
    # (reference MetLib/Detector.py:258-276), so an event must be gone
    # two frames later or it masks itself -- merge 0.8s exposures so the
    # meteor occupies ~2 merged frames mid-clip
    m = SynthMeteor(start_sec=4.0, end_sec=5.6, pt1=(150, 25),
                    pt2=(95, 70), brightness=250, decay_sec=0.12)
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=8.0, meteors=[m],
                                   n_stars=4, noise_sigma=0.7)
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = 0.8
    cfg.detector.name = "ClassicDetector"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(frames, None, cfg, work_mode="backend")
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1


def test_visu_renderers_draw_on_frame():
    from metdetpy_tpu.visu import (DotColorPair, DrawCircleVisu,
                                   DrawRectVisu, ImgVisuAttrs,
                                   SquareColorPair, TextColorPair, TextVisu)
    base = np.zeros((80, 120, 3), np.uint8)
    scaler = (1.0, 1.0)
    rect = DrawRectVisu("r", pair_list=[
        SquareColorPair(dot_pair=([10, 10], [60, 50]), color="green")],
        thickness=2)
    out = rect.render(base.copy(), scaler)
    assert out[10, 30].tolist() == [0, 255, 0]
    circ = DrawCircleVisu("c", dot_list=[DotColorPair(dot=(30, 30),
                                                      color="red")],
                          radius=3, thickness=-1)
    out = circ.render(base.copy(), scaler)
    assert out[30, 30].tolist() == [0, 0, 255]
    txt = TextVisu("t", text_list=[TextColorPair("hi", position=[5, 20])],
                   color="white")
    out = txt.render(base.copy(), scaler)
    assert out.sum() > 0
    overlay = ImgVisuAttrs("o", weight=0.5,
                           img=np.full((80, 120), 200, np.uint8),
                           color="yellow")
    out = overlay.render(base.copy(), scaler)
    assert out.sum() > 0


def test_detect_multi_stream_convenience():
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.parallel.mesh import build_mesh
    from metdetpy_tpu.parallel.multistream import detect_multi_stream
    from metdetpy_tpu.structs import RuntimeParams
    streams = []
    for s in range(4):
        meteors = ([SynthMeteor(0.3, 2.3, (90, 30), (40, 70))]
                   if s == 1 else [SynthMeteor(99, 100, (0, 0), (1, 1))])
        streams.append(generate_meteor_video(
            width=128, height=96, fps=FPS, duration_sec=2.56,
            meteors=meteors, n_stars=15, noise_sigma=2.5, seed=10 + s))
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.detector.window_sec = 0.4
    cfg.collector.recheck_cfg.switch = False
    rt = RuntimeParams(fps=FPS, exp_frame=1, eq_fps=FPS, eq_int_fps=25,
                       exp_time=1 / FPS, runtime_size=[128, 96],
                       raw_size=[128, 96],
                       positive_category_list=["METEOR", "RED_SPRITE"])
    mesh = build_mesh(4, axis_name="stream")
    per_stream = detect_multi_stream(streams, cfg, rt, BaseMetLog(),
                                     mesh=mesh, block_frames=64)
    assert len(per_stream) == 4
    meteor_streams = [i for i, recs in enumerate(per_stream)
                      if any(t.category == "METEOR"
                             for r in recs for t in r.target)]
    assert meteor_streams == [1], meteor_streams


def test_native_bgr2gray_assemble_matches_cv2(rng):
    """Fused native color path (resize + BT.601 gray + exposure merge)
    is bit-exact with the per-frame cv2 sequence it replaces."""
    import cv2
    from metdetpy_tpu.native import bgr2gray, resize_bgr2gray_assemble_u8
    frames = [np.ascontiguousarray(
        rng.integers(0, 255, (60, 90, 3), np.uint8)) for _ in range(8)]
    # plain bgr2gray parity
    np.testing.assert_array_equal(
        bgr2gray(frames[0]),
        cv2.cvtColor(frames[0], cv2.COLOR_BGR2GRAY))
    # fused: exp_frame=2, downscale to (45, 30)
    block = np.zeros((4, 30, 45), np.uint8)
    resize_bgr2gray_assemble_u8(frames, block, 0, exp_frame=2)
    for g in range(4):
        acc = None
        for f in frames[g * 2:(g + 1) * 2]:
            small = cv2.resize(f, (45, 30), interpolation=cv2.INTER_LINEAR)
            gray = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)
            acc = gray if acc is None else np.maximum(acc, gray)
        np.testing.assert_array_equal(block[g], acc)
    # same-size source: resize skipped, straight conversion
    block2 = np.zeros((8, 60, 90), np.uint8)
    resize_bgr2gray_assemble_u8(frames, block2, 0, exp_frame=1)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(
            block2[i], cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))

def test_collector_sentinel_never_leaks_on_long_runs():
    """The sentinel series (synthetic activation frame 2**16) must never be
    expired or exported, even when a long run passes frame 65536 (44 min at
    25 fps), and clear() must flush tracks regardless of video length."""
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.structs import RuntimeParams
    from metdetpy_tpu.track.collector import MeteorCollector

    outputs = []

    class Log(BaseMetLog):
        def meteor(self, msg):
            outputs.append(("meteor", msg))

        def dropped(self, msg):
            outputs.append(("dropped", msg))

    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    rp = RuntimeParams(fps=25.0, exp_frame=1, eq_fps=25.0, eq_int_fps=25,
                       exp_time=0.04, runtime_size=[320, 180],
                       raw_size=[640, 360],
                       positive_category_list=["METEOR"])
    coll = MeteorCollector(cfg.collector, rp, None, Log())
    nc = 10
    cate = np.zeros(nc)
    cate[0] = 1.0
    # a short line track at ~frame 70_000 (past the sentinel's 2**16)
    for t in range(70_000, 70_040, 2):
        x = 100 + (t - 70_000)
        coll.update(t, [np.array([x, 50, x + 12, 58])], [cate])
    # idle updates expire the track; the sentinel must survive untouched
    for t in range(70_100, 72_000, 100):
        coll.update(t, [], [])
    assert coll._sentinel in coll.active_meteor
    coll.clear()
    texts = [str(m) for _, m in outputs]
    assert not any("-100" in s for s in texts), texts
    assert len(outputs) >= 1  # the real track was flushed out


def test_classic_dense_noise_keeps_detecting(monkeypatch):
    """Dense-noise fairness (reference drops only at >500 LINES,
    MetLib/Detector.py:358-360 — never on raw point count): a noisy clip
    whose binarized+dilated 4-frame dst exceeds the M3 default point
    budget (8192) must still be detected by ClassicDetector. The
    area-derived default budget keeps such frames; pinning the OLD fixed
    budget on the same frames overflow-drops them — the divergence this
    test exists to prevent."""
    import cv2

    from metdetpy_tpu.detectors.m3det import ClassicDetector, _unpack
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.structs import MainDetectCfg

    h, w = 270, 480
    monkeypatch.delenv("METDETPY_TPU_MAX_POINTS", raising=False)
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json")).detector.cfg
    cfg.binary.adaptive_bi_thre = False
    cfg.binary.init_value = 29  # ~1% Gaussian tail at sigma=8 (below)
    cfg.dynamic.dy_mask = False

    rng = np.random.default_rng(11)
    block = np.clip(
        rng.normal(32.0, 8.0, (16, h, w)), 0, 255).astype(np.uint8)
    # bright streak on ONE frame (uzanka regime: gone 2 frames later so
    # the newest-pair suppression mask never sees it)
    cv2.line(block[8], (60, 40), (300, 200), 255, 2)

    def run(**kw):
        det = ClassicDetector(window_sec=0.16, fps=25.0,
                              mask=np.ones((h, w), np.uint8), num_cls=2,
                              cfg=cfg, logger=BaseMetLog(), **kw)
        handle = det.process_block_async(block)
        lines, valid, extras = _unpack(np.asarray(handle[0]),
                                       det.max_peaks)
        return det, lines, valid, extras

    det, lines, valid, extras = run()
    area_budget = min(max(8192, h * w // 8), 1 << 16)
    assert det.max_points == area_budget
    npix, overflow = extras[:, 1], extras[:, 2]
    # steady state only: t<3 diffs against the zero-filled history and is
    # discarded by the CLASSIC_WINDOW warmup gating anyway
    # the clip IS dense: noise alone binarizes past the old fixed budget
    assert npix[3:].min() > 8192, npix
    # ...yet no frame overflows the area-derived budget, and the streak
    # is found on the frames whose OLDEST pair contains it (t=7, t=8)
    assert not overflow[3:].any(), npix
    assert valid[7].any() or valid[8].any()

    # contrast leg: the old fixed budget drops every dense frame
    _, lines2, valid2, extras2 = run(max_points=8192)
    assert extras2[3:, 2].all()          # overflow on all steady frames
    assert not valid2[7:9].any()         # ...so the streak is lost
