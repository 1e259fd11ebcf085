"""End-to-end detection on a synthetic annotated meteor clip.

This replaces the reference's missing LFS test video (SURVEY.md §4): a
synthetic streak from (45%, 25%) to (30%, 55%) of the frame during
2.4s..4.4s must be detected as one METEOR record at roughly the right time
and place.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path, ts2frame

W, H, FPS = 256, 144, 25.0


@pytest.fixture(scope="module")
def synth_frames():
    meteor = SynthMeteor(start_sec=2.4, end_sec=4.4,
                         pt1=(int(W * 0.45), int(H * 0.25)),
                         pt2=(int(W * 0.30), int(H * 0.55)))
    return generate_meteor_video(width=W, height=H, fps=FPS,
                                 duration_sec=6.5, meteors=[meteor],
                                 n_stars=40, noise_sigma=3.0)


def _base_cfg() -> MainDetectCfg:
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False  # no weights in this env
    return cfg


def test_detects_synthetic_meteor(synth_frames):
    cfg = _base_cfg()
    mdrf = detect_video(synth_frames, None, cfg, work_mode="backend")
    records = mdrf.results
    meteors = [t for rec in records for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1, f"no METEOR found in {len(records)} records"
    best = max(meteors, key=lambda t: t.score)
    sf = ts2frame(best.start_time, FPS)
    ef = ts2frame(best.end_time, FPS)
    # temporal tolerance: +-1s around [2.4, 4.4]
    assert abs(sf / FPS - 2.4) < 1.0, best.start_time
    assert abs(ef / FPS - 4.4) < 1.2, best.end_time
    # spatial: range endpoints near the annotated trajectory box
    xs = sorted([best.pt1[0], best.pt2[0]])
    ys = sorted([best.pt1[1], best.pt2[1]])
    assert abs(xs[0] - int(W * 0.30)) < 15 and abs(xs[1] - int(W * 0.45)) < 15
    assert abs(ys[0] - int(H * 0.25)) < 15 and abs(ys[1] - int(H * 0.55)) < 15
    assert best.score > 0.5


def test_no_false_positive_on_empty_sky():
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=3.0, meteors=[
                                       SynthMeteor(99, 100, (0, 0), (1, 1))],
                                   n_stars=40, noise_sigma=3.0)
    cfg = _base_cfg()
    mdrf = detect_video(frames, None, cfg, work_mode="backend")
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR" and t.score >= 0.5]
    assert len(meteors) == 0


def test_frame_loop_loader_parity(synth_frames):
    """ThreadVideoLoader (per-frame path) finds the same meteor."""
    cfg = _base_cfg()
    cfg.loader.name = "ThreadVideoLoader"
    mdrf = detect_video(synth_frames, None, cfg, work_mode="backend")
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1


def test_device_failure_recovery(synth_frames, monkeypatch):
    """A transient device/backend fault mid-run (the tunneled TPU throws
    occasional FAILED_PRECONDITION) must not kill detection: the block
    loop drops the failed block, resets the detector's device state and
    continues; the meteor in a later block is still found.

    Exercises the INCREMENTAL collect pipeline (per-block fetch faults);
    the deferred-collection path has its own tests below."""
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "0")
    from metdetpy_tpu.detectors.m3det import M3Detector

    orig_collect = M3Detector.collect
    state = {"calls": 0, "resets": 0}

    def flaky_collect(self, handle):
        state["calls"] += 1
        if state["calls"] == 1:  # first block (pre-meteor) fails
            raise RuntimeError("injected FAILED_PRECONDITION")
        return orig_collect(self, handle)

    orig_reset = M3Detector.reset_device_state

    def counting_reset(self):
        state["resets"] += 1
        return orig_reset(self)

    monkeypatch.setattr(M3Detector, "collect", flaky_collect)
    monkeypatch.setattr(M3Detector, "reset_device_state", counting_reset)
    cfg = _base_cfg()
    mdrf = detect_video(synth_frames, None, cfg, work_mode="backend")
    assert state["resets"] == 1
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1, "meteor lost after recovered fault"


def test_persistent_device_failure_aborts(synth_frames, monkeypatch):
    """Three consecutive POST-reset failures abort the run. Failures of
    blocks already inflight when a reset happens are poisoned by the same
    fault and don't count, so the clip must span enough blocks for three
    distinct reset epochs: shrink block/pipeline sizes to guarantee it."""
    from metdetpy_tpu.detectors.m3det import M3Detector

    def always_fail(self, handle):
        raise RuntimeError("persistent backend failure")

    monkeypatch.setattr(M3Detector, "collect", always_fail)
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "0")
    monkeypatch.setenv("METDETPY_TPU_BLOCK_FRAMES", "8")
    monkeypatch.setenv("METDETPY_TPU_PIPELINE_DEPTH", "2")
    cfg = _base_cfg()
    with pytest.raises(RuntimeError, match="persistent backend failure"):
        detect_video(synth_frames, None, cfg, work_mode="backend")


def test_transient_fault_does_not_abort_deep_pipeline(synth_frames,
                                                      monkeypatch):
    """One transient fault typically poisons every already-dispatched
    inflight handle; their back-to-back failures must not trip the
    consecutive-failure abort (they are zero-filled instead), and
    detection continues after the single reset."""
    from metdetpy_tpu.detectors.m3det import M3Detector

    orig_collect = M3Detector.collect
    state = {"calls": 0, "resets": 0}

    def flaky_collect(self, handle):
        state["calls"] += 1
        # the fault and the 3 handles dispatched before the reset all fail
        if 1 <= state["calls"] <= 4:
            raise RuntimeError("injected FAILED_PRECONDITION")
        return orig_collect(self, handle)

    orig_reset = M3Detector.reset_device_state

    def counting_reset(self):
        state["resets"] += 1
        return orig_reset(self)

    monkeypatch.setattr(M3Detector, "collect", flaky_collect)
    monkeypatch.setattr(M3Detector, "reset_device_state", counting_reset)
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "0")
    monkeypatch.setenv("METDETPY_TPU_BLOCK_FRAMES", "16")
    monkeypatch.setenv("METDETPY_TPU_PIPELINE_DEPTH", "4")
    cfg = _base_cfg()
    mdrf = detect_video(synth_frames, None, cfg, work_mode="backend")
    assert state["resets"] == 1, state


def test_deferred_collect_finds_meteor(synth_frames, monkeypatch):
    """The deferred-collection path (one stacked fetch per horizon,
    api._run_block_loop flush_deferred) finds the same meteor, including
    across multiple small horizons."""
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "1")
    monkeypatch.setenv("METDETPY_TPU_COLLECT_HORIZON", "2")
    monkeypatch.setenv("METDETPY_TPU_BLOCK_FRAMES", "32")
    cfg = _base_cfg()
    mdrf = detect_video(synth_frames, None, cfg, work_mode="backend")
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1


def test_deferred_horizon_fault_falls_back_per_block(synth_frames,
                                                     monkeypatch):
    """When the horizon's stacked fetch fails, flush_deferred falls back
    to per-block collection: failing blocks are zero-filled with one
    device reset, surviving blocks keep their results, and detection
    continues."""
    from metdetpy_tpu.detectors.m3det import LineDetector, M3Detector

    orig_collect = M3Detector.collect
    state = {"many": 0, "calls": 0, "resets": 0}

    def failing_collect_many(self, handles):
        state["many"] += 1
        raise RuntimeError("injected horizon fetch failure")

    def flaky_collect(self, handle):
        state["calls"] += 1
        if state["calls"] == 1:  # first block (pre-meteor) fails too
            raise RuntimeError("injected FAILED_PRECONDITION")
        return orig_collect(self, handle)

    orig_reset = M3Detector.reset_device_state

    def counting_reset(self):
        state["resets"] += 1
        return orig_reset(self)

    monkeypatch.setattr(LineDetector, "collect_many", failing_collect_many)
    monkeypatch.setattr(M3Detector, "collect", flaky_collect)
    monkeypatch.setattr(M3Detector, "reset_device_state", counting_reset)
    monkeypatch.setenv("METDETPY_TPU_DEFERRED_COLLECT", "1")
    cfg = _base_cfg()
    mdrf = detect_video(synth_frames, None, cfg, work_mode="backend")
    assert state["many"] >= 1 and state["resets"] == 1, state
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1, "meteor lost after recovered horizon fault"
