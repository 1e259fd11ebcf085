"""Detection-quality gate for the recheck stage with the shipped trained
weights: a synthetic meteor must survive recheck as METEOR with raw/recheck
scores populated (reference behavior: MetLib/collector.py:772-866)."""

import numpy as np
import pytest

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path

W, H, FPS = 640, 360, 25.0


@pytest.fixture(scope="module")
def meteor_frames():
    m = SynthMeteor(start_sec=2.4, end_sec=4.4,
                    pt1=(int(W * 0.45), int(H * 0.25)),
                    pt2=(int(W * 0.30), int(H * 0.55)))
    return generate_meteor_video(width=W, height=H, fps=FPS,
                                 duration_sec=8.0, meteors=[m],
                                 n_stars=40, color=True)


def test_meteor_survives_recheck_with_trained_weights(meteor_frames):
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = 320
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = True
    mdrf = detect_video(meteor_frames, None, cfg, work_mode="backend")
    meteors = [t for rec in mdrf.results for t in rec.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1, [
        (t.category, t.score) for rec in mdrf.results for t in rec.target]
    t = meteors[0]
    assert t.raw_score is not None and t.recheck_score is not None
    assert t.recheck_score >= 0.5
    assert t.relative_brightness is not None
    assert t.aesthetic_score is not None
    # fused score = mean(raw, recheck) rounded to 2 decimals
    assert abs(t.score - round((t.raw_score + t.recheck_score) / 2, 2)) < 0.011
