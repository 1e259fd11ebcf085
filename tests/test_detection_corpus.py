"""Detection-quality corpus: precision/recall >= 0.8 across hard scenes.

The reference publishes >80% precision and recall averaged over a
multi-device corpus (reference readme.md:123). Its canonical test corpus
is LFS-absent, so this synthesizes the hard cases called out in VERDICT
r1 item 5 -- a fast meteor near the scoring envelope, simultaneous
meteors, a plane-like slow mover, cloud flicker, and a masked bright
distractor -- runs the full default pipeline on each, and aggregates
TP/FP/FN with the reference's own matching rule (TIoU>=0.3 and box
IoU>=0.3, reference evaluate.py:176-307).
"""

import dataclasses

import cv2
import numpy as np
import pytest

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import (SynthCloud, SynthMeteor, SynthPlane,
                                generate_meteor_video, write_video)
from metdetpy_tpu.utils import relative2abs_path

W, H, FPS = 256, 144, 25.0
DURATION = 8.0


@dataclasses.dataclass
class Scenario:
    name: str
    meteors: list          # ground-truth SynthMeteors (expected METEOR)
    planes: list
    clouds: list
    mask: bool = False
    seed: int = 0


# fix_speed = px_per_frame * FPS / long_side * 100 = 9.77 * px_per_frame
# (collector.py:244-278 normalization); speed_range [2, 21] in the normal
# preset -> full score below ~2.15 px/frame, zero past ~4.3
SCENARIOS = [
    Scenario("single_normal",
             meteors=[SynthMeteor(2.4, 4.4, (int(W * .45), int(H * .25)),
                                  (int(W * .30), int(H * .55)))],
             planes=[], clouds=[], seed=21),
    Scenario("fast_near_cap",
             # 49 px in 0.8s = 2.45 px/frame -> fix_speed ~24, inside the
             # decaying edge of the speed trapezoid (21..42)
             meteors=[SynthMeteor(3.0, 3.8, (205, 30), (165, 58))],
             planes=[], clouds=[], seed=22),
    Scenario("two_simultaneous",
             meteors=[SynthMeteor(2.0, 3.6, (60, 30), (95, 75)),
                      SynthMeteor(2.8, 4.4, (215, 110), (180, 65))],
             planes=[], clouds=[], seed=23),
    Scenario("plane_blinking",
             meteors=[],
             # 0.3 px/frame: the 1s-window streak (~7.5 px) stays under
             # hough min_len=10, and blinking breaks the trail -- the same
             # mechanism that keeps the reference from lining slow movers
             planes=[SynthPlane(0.8, 7.5, (30, 100), (80, 88),
                                blink_hz=1.0)],
             clouds=[], seed=24),
    Scenario("cloud_flicker",
             meteors=[], planes=[],
             clouds=[SynthCloud((70, 90), sigma=40.0, amplitude=30.0),
                     SynthCloud((200, 40), sigma=55.0, amplitude=22.0)],
             seed=25),
    Scenario("masked_tower_light",
             meteors=[SynthMeteor(2.4, 4.4, (int(W * .60), int(H * .25)),
                                  (int(W * .42), int(H * .60)))],
             # stationary 2Hz strobe inside the masked quarter
             planes=[SynthPlane(0.0, 8.0, (28, 70), (28, 70),
                                brightness=240, blink_hz=2.0,
                                blink_duty=0.5)],
             clouds=[], mask=True, seed=26),
]


def _run_scenario(sc: Scenario, tmp_path):
    # frames are fed in-memory (NumpyVideoWrapper): this corpus scores the
    # DETECTION pipeline; codec DCT artifacts at tiny resolutions are a
    # separate concern (encoded-clip parity is covered by
    # test_reference_parity / test_evaluate_f1)
    frames = generate_meteor_video(
        width=W, height=H, fps=FPS, duration_sec=DURATION,
        meteors=sc.meteors, planes=sc.planes, clouds=sc.clouds,
        n_stars=40, noise_sigma=3.0, seed=sc.seed)

    mask_path = None
    if sc.mask:
        # jpg mask: bright = keep (load_mask binarize >128); black out the
        # left quarter holding the strobe
        mask = np.full((H, W), 255, np.uint8)
        mask[:, : W // 4] = 0
        mask_path = str(tmp_path / f"{sc.name}_mask.jpg")
        cv2.imwrite(mask_path, mask)

    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(frames, mask_path, cfg, work_mode="backend")
    preds = [t for rec in mdrf.results for t in rec.target
             if t.category == "METEOR"]
    return preds


def _tiou(a0, a1, b0, b1):
    inter = max(0.0, min(a1, b1) - max(a0, b0))
    union = max(a1, b1) - min(a0, b0)
    return inter / union if union > 0 else 0.0


def _box_iou(p1a, p2a, p1b, p2b):
    ax0, ax1 = sorted((p1a[0], p2a[0]))
    ay0, ay1 = sorted((p1a[1], p2a[1]))
    bx0, bx1 = sorted((p1b[0], p2b[0]))
    by0, by1 = sorted((p1b[1], p2b[1]))
    ix = max(0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    union = ((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter)
    return inter / union if union > 0 else 0.0


def _match(preds, gts):
    """Greedy matching with the reference's gate (TIoU>=0.3 & IoU>=0.3)."""
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
    fp = len(preds) - tp
    fn = len(gts) - tp
    return tp, fp, fn


def test_corpus_precision_recall_above_published_bar(tmp_path):
    tot_tp = tot_fp = tot_fn = 0
    per_scene = {}
    for sc in SCENARIOS:
        preds = _run_scenario(sc, tmp_path)
        tp, fp, fn = _match(preds, sc.meteors)
        per_scene[sc.name] = (tp, fp, fn)
        tot_tp += tp
        tot_fp += fp
        tot_fn += fn
    precision = tot_tp / max(tot_tp + tot_fp, 1)
    recall = tot_tp / max(tot_tp + tot_fn, 1)
    assert precision >= 0.8, (precision, per_scene)
    assert recall >= 0.8, (recall, per_scene)
    # the distractor-only scenes must stay clean
    assert per_scene["plane_blinking"][1] == 0, per_scene
    assert per_scene["cloud_flicker"][1] == 0, per_scene
