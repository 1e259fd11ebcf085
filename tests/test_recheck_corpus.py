"""Recheck-ON detection-quality gate (VERDICT r2 weak #6): a color variant
of the hard-case corpus runs with ``recheck_cfg.switch=True`` and the
shipped trained weights, so a weights or score-fusion regression fails CI
instead of riding on the recheck-OFF corpus. Recheck demotes unmatched
proposals to DROPPED/OTHERS (reference MetLib/collector.py:844-864) --
recall through this gate proves the YOLO confirm path actually fires.
"""

import dataclasses

import pytest

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import (SynthMeteor, SynthPlane,
                                generate_meteor_video)
from metdetpy_tpu.utils import relative2abs_path

from test_detection_corpus import _box_iou, _tiou

W, H, FPS = 320, 180, 25.0
DURATION = 8.0


@dataclasses.dataclass
class Scenario:
    name: str
    meteors: list
    planes: list
    seed: int


SCENARIOS = [
    Scenario("single_normal",
             meteors=[SynthMeteor(2.4, 4.4, (int(W * .45), int(H * .25)),
                                  (int(W * .30), int(H * .55)))],
             planes=[], seed=31),
    Scenario("two_sequential",
             meteors=[SynthMeteor(1.6, 3.2, (75, 40), (115, 95)),
                      SynthMeteor(4.4, 6.2, (270, 140), (225, 80))],
             planes=[], seed=32),
    Scenario("plane_blinking",
             meteors=[],
             planes=[SynthPlane(0.8, 7.5, (40, 125), (100, 110),
                                blink_hz=1.0)],
             seed=33),
]


def _match(preds, gts):
    tp, used = 0, set()
    for p in preds:
        p0, p1 = p.start_frame, p.last_activate_frame
        for gi, g in enumerate(gts):
            if gi in used:
                continue
            g0, g1 = g.start_sec * FPS, g.end_sec * FPS
            if (_tiou(p0, p1, g0, g1) >= 0.3
                    and _box_iou(p.pt1, p.pt2, g.pt1, g.pt2) >= 0.3):
                used.add(gi)
                tp += 1
                break
    return tp, len(preds) - tp, len(gts) - tp


def test_recheck_corpus_precision_recall(tmp_path):
    tot_tp = tot_fp = tot_fn = 0
    per_scene = {}
    rechecked = 0
    for sc in SCENARIOS:
        frames = generate_meteor_video(
            width=W, height=H, fps=FPS, duration_sec=DURATION,
            meteors=sc.meteors, planes=sc.planes, n_stars=40,
            noise_sigma=3.0, seed=sc.seed, color=True)
        cfg = MainDetectCfg.from_json_file(
            relative2abs_path("./config/m3det_normal.json"))
        cfg.loader.name = "BlockVideoLoader"
        cfg.loader.wrapper = "NumpyVideoWrapper"
        cfg.loader.resize = None
        cfg.loader.exp_time = "real-time"
        cfg.collector.recheck_cfg.switch = True
        mdrf = detect_video(frames, None, cfg, work_mode="backend")
        preds = [t for rec in mdrf.results for t in rec.target
                 if t.category == "METEOR"]
        rechecked += sum(1 for p in preds if p.recheck_score is not None)
        tp, fp, fn = _match(preds, sc.meteors)
        per_scene[sc.name] = (tp, fp, fn)
        tot_tp += tp
        tot_fp += fp
        tot_fn += fn
    precision = tot_tp / max(tot_tp + tot_fp, 1)
    recall = tot_tp / max(tot_tp + tot_fn, 1)
    assert precision >= 0.8, (precision, per_scene)
    assert recall >= 0.8, (recall, per_scene)
    # the surviving meteors must actually have been rechecked (fusion ran)
    assert rechecked >= tot_tp, (rechecked, per_scene)
    assert per_scene["plane_blinking"][1] == 0, per_scene
