"""Pipeline-mechanics tests for the DL paths: the recheck stage consuming
in-memory color stacks (no second decode) and the MLDetector main loop.
Random YOLO weights -- these verify plumbing and failure-handling, not
detection quality."""

import os

import numpy as np
import pytest

os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path

W, H, FPS = 192, 108, 25.0


@pytest.fixture(scope="module")
def color_frames():
    m = SynthMeteor(start_sec=1.2, end_sec=2.2,
                    pt1=(int(W * .7), int(H * .25)),
                    pt2=(int(W * .3), int(H * .6)))
    return generate_meteor_video(width=W, height=H, fps=FPS,
                                 duration_sec=3.5, meteors=[m], n_stars=25,
                                 noise_sigma=2.5, color=True)


def test_recheck_with_block_loader_color_stacks(color_frames, monkeypatch):
    """Recheck on: the exporter must get stacked color images from the
    loader's in-memory chunks and run the model; with random weights the
    matching demotes proposals (OTHERS/DROPPED) but the pipeline completes
    and emits records."""
    monkeypatch.setenv("METDETPY_TPU_YOLO_HW", "96x96")
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = True
    mdrf = detect_video(color_frames, None, cfg, work_mode="backend")
    # the raw proposal was strong; after recheck with garbage weights it is
    # recategorized rather than lost
    cats = [t.category for rec in mdrf.results for t in rec.target]
    assert len(cats) >= 1
    assert all(c in ("METEOR", "OTHERS", "DROPPED") or isinstance(c, str)
               for c in cats)
    rechecked = [t for rec in mdrf.results for t in rec.target
                 if t.raw_score is not None or t.category in ("OTHERS",
                                                              "DROPPED")]
    assert len(rechecked) >= 1, cats


def test_mldetector_main_loop(color_frames, monkeypatch):
    """dldet-style config: MLDetector over max-stacked color windows."""
    monkeypatch.setenv("METDETPY_TPU_YOLO_HW", "96x96")
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/dldet.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(color_frames[:40], None, cfg, work_mode="backend")
    # with random weights results are arbitrary; the run must complete and
    # produce a well-formed MDRF -- and must actually have processed frames
    # (guards against the decode thread dying silently)
    assert mdrf.type == "prediction"
    assert mdrf.performance and mdrf.performance["frames"] >= 39
    for rec in mdrf.results:
        for t in rec.target:
            assert len(t.pt1) == 2 and len(t.pt2) == 2

def test_mldetector_detection_quality():
    """dldet pipeline with the shipped trained weights: the MLDetector's
    max-stacked windows must yield a METEOR record near the trajectory."""
    W2, H2 = 640, 360
    m = SynthMeteor(start_sec=2.4, end_sec=4.4,
                    pt1=(int(W2 * 0.45), int(H2 * 0.25)),
                    pt2=(int(W2 * 0.30), int(H2 * 0.55)))
    frames = generate_meteor_video(width=W2, height=H2, fps=25.0,
                                   duration_sec=8.0, meteors=[m],
                                   n_stars=40, color=True)
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/dldet.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = 320
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(frames, None, cfg, work_mode="backend")
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert meteors, [(t.category, t.score) for rec in mdrf.results
                     for t in rec.target]
    # trajectory in raw coords: (288,90) -> (192,198)
    t = meteors[0]
    xs = [t.pt1[0], t.pt2[0]]
    ys = [t.pt1[1], t.pt2[1]]
    assert min(xs) < 288 and max(xs) > 192
    assert min(ys) < 198 and max(ys) > 90


def test_mldetector_device_fault_recovery(color_frames, monkeypatch):
    """A transient fault on one MLDetector block must be recovered by the
    block loop (reset_device_state + zero-fill), not kill the run — the
    dldet analog of test_device_failure_recovery. Pins the INCREMENTAL
    collect path (deferred collection defaults on for MLDetector since it
    grew collect_many; its fault fallback is covered separately below)."""
    from metdetpy_tpu.detectors.mldet import MLDetector

    monkeypatch.setenv("METDETPY_TPU_YOLO_HW", "96x96")
    monkeypatch.setenv("METDETPY_TPU_BLOCK_FRAMES", "16")
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "0")
    orig_collect = MLDetector.collect
    state = {"calls": 0, "resets": 0}

    def flaky_collect(self, handle):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("injected FAILED_PRECONDITION")
        return orig_collect(self, handle)

    orig_reset = MLDetector.reset_device_state

    def counting_reset(self):
        state["resets"] += 1
        return orig_reset(self)

    monkeypatch.setattr(MLDetector, "collect", flaky_collect)
    monkeypatch.setattr(MLDetector, "reset_device_state", counting_reset)
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/dldet.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(color_frames, None, cfg, work_mode="backend")
    assert state["resets"] == 1
    # the run completed and processed every frame after the dropped block
    assert mdrf.performance and mdrf.performance["frames"] >= 80


def test_mldetector_deferred_collect_fault_fallback(color_frames,
                                                    monkeypatch):
    """Deferred-collection leg of the fault story: when the grouped
    horizon fetch (collect_many) fails, flush_deferred must fall back to
    per-block collect with the same reset recovery — one flaky block is
    zero-filled, every other block's results still come through."""
    from metdetpy_tpu.detectors.mldet import MLDetector

    monkeypatch.setenv("METDETPY_TPU_YOLO_HW", "96x96")
    monkeypatch.setenv("METDETPY_TPU_BLOCK_FRAMES", "16")
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "1")
    state = {"many_calls": 0, "collect_calls": 0, "resets": 0}

    def flaky_many(self, handles):
        state["many_calls"] += 1
        raise RuntimeError("injected horizon-fetch failure")

    orig_collect = MLDetector.collect

    def flaky_collect(self, handle):
        state["collect_calls"] += 1
        if state["collect_calls"] == 1:
            raise RuntimeError("injected FAILED_PRECONDITION")
        return orig_collect(self, handle)

    orig_reset = MLDetector.reset_device_state

    def counting_reset(self):
        state["resets"] += 1
        return orig_reset(self)

    monkeypatch.setattr(MLDetector, "collect_many", flaky_many)
    monkeypatch.setattr(MLDetector, "collect", flaky_collect)
    monkeypatch.setattr(MLDetector, "reset_device_state", counting_reset)
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/dldet.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(color_frames, None, cfg, work_mode="backend")
    assert state["many_calls"] >= 1          # deferred path was active
    assert state["collect_calls"] >= 2       # per-block fallback ran
    assert state["resets"] == 1              # flaky block recovered
    assert mdrf.performance and mdrf.performance["frames"] >= 80


def test_fetch_gray_rois_matches_per_detection_slicing():
    """The batched orientation-ROI gather (_fetch_gray_rois) must be
    bit-equal to the old per-detection path: plain-slice semantics on
    raw (negative / overshooting) box coords, then cv2's exact BGR->GRAY
    fixed-point conversion -- including the oversize fallback leg and
    empty slices."""
    import cv2
    import jax.numpy as jnp

    from metdetpy_tpu.detectors.mldet import MLDetector

    rng = np.random.default_rng(3)
    stacks = rng.integers(0, 256, (4, 90, 160, 3), np.uint8)
    stacks_dev = jnp.asarray(stacks)
    det = MLDetector.__new__(MLDetector)   # only _fetch_gray_rois needed
    dets = [
        (0, 10, 40, 20, 80),          # plain in-window box
        (1, -5, 25, 140, 200),        # negative start + x overshoot
        (2, 0, 90, 0, 160),           # full frame (oversize fallback)
        (3, 50, 50, 10, 20),          # empty (y1 == y2)
        (1, 83, 200, 3, 9),           # bottom edge clamp
    ]
    got = det._fetch_gray_rois(stacks_dev, dets)
    for (t, y1, y2, x1, x2), roi in zip(dets, got):
        ref_bgr = stacks[t, y1:y2, x1:x2]
        if ref_bgr.size == 0:
            assert roi.size == 0
            continue
        ref = cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(roi, ref)
