"""Golden cross-framework parity: run the ACTUAL reference implementation
(/root/reference, unmodified, via the tests/ref_shims import shims) and the
TPU rebuild on the same encoded synthetic clip, then diff the MDRFs.

This is the SURVEY.md §7 "bit-compatible results.json" mandate reduced to
what is provable in-environment: identical MDRF schema, identical event
count and categories, and tight agreement on the event geometry/timing.
Exact per-field equality is impossible by construction -- the reference's
cv2.HoughLinesP is randomized (SURVEY.md §7 "Hard parts"), so per-frame
line sets (and hence accumulated point clouds, scores in the last decimal)
differ run to run even between two reference runs.

Reference call path exercised: MetDetPy.detect_video (MetDetPy.py:24-250)
with ThreadVideoLoader/OpenCVVideoWrapper, M3Detector, recheck off.
"""

import importlib.util
import json
import sys

import cv2
import numpy as np
import pytest

REF_ROOT = "/root/reference"
SHIM_DIR = __file__.rsplit("/", 1)[0] + "/ref_shims"

FPS = 25.0
W, H = 960, 540
DURATION = 12.0
METEOR_T0, METEOR_T1 = 2.4, 4.4


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
    frames = generate_meteor_video(
        width=W, height=H, fps=FPS, duration_sec=DURATION,
        meteors=[SynthMeteor(METEOR_T0, METEOR_T1,
                             pt1=(int(W * 0.55), int(H * 0.25)),
                             pt2=(int(W * 0.30), int(H * 0.60)))],
        n_stars=120, noise_sigma=4.0, seed=11)
    path = str(tmp_path_factory.mktemp("refparity") / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS,
                             (W, H))
    assert writer.isOpened()
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    writer.release()
    return path


@pytest.fixture(scope="module")
def reference_mdrf(clip_path):
    """Run the unmodified reference detect_video on the clip."""
    added = []
    for p in (SHIM_DIR, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    # this image's OpenCV build returns [N, 4] from HoughLinesP; the
    # reference indexes [:, 0, :] expecting the classic [N, 1, 4]
    # (reference MetLib/Detector.py:353) -- adapt the return shape only
    orig_hlp = cv2.HoughLinesP

    def _hlp(*args, **kwargs):
        out = orig_hlp(*args, **kwargs)
        if out is not None and out.ndim == 2:
            out = out[:, None, :]
        return out

    cv2.HoughLinesP = _hlp
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_metdetpy", REF_ROOT + "/MetDetPy.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        from MetLib.metstruct import MainDetectCfg as RefCfg
        cfg = RefCfg.from_json_file(REF_ROOT + "/config/m3det_normal.json")
        cfg.loader.exp_time = "real-time"   # deterministic, no estimator
        cfg.loader.wrapper = "OpenCVVideoWrapper"  # PyAV absent in-image
        cfg.collector.recheck_cfg.switch = False
        mdrf = ref.detect_video(clip_path, None, cfg, work_mode="backend")
        return mdrf.to_dict()
    finally:
        cv2.HoughLinesP = orig_hlp
        for p in added:
            sys.path.remove(p)


@pytest.fixture(scope="module")
def rebuild_mdrf(clip_path):
    from metdetpy_tpu.api import detect_video
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import relative2abs_path
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "OpenCVVideoWrapper"
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    mdrf = detect_video(clip_path, None, cfg, work_mode="backend")
    return mdrf.to_dict()


def _meteor_targets(mdrf_dict):
    out = []
    for rec in mdrf_dict["results"]:
        for t in rec["target"]:
            if t["category"] == "METEOR":
                out.append(t)
    return out


def _tiou(a0, a1, b0, b1):
    inter = max(0.0, min(a1, b1) - max(a0, b0))
    union = max(a1, b1) - min(a0, b0)
    return inter / union if union > 0 else 0.0


def _box_iou(t1, t2):
    ax0, ax1 = sorted((t1["pt1"][0], t1["pt2"][0]))
    ay0, ay1 = sorted((t1["pt1"][1], t1["pt2"][1]))
    bx0, bx1 = sorted((t2["pt1"][0], t2["pt2"][0]))
    by0, by1 = sorted((t2["pt1"][1], t2["pt2"][1]))
    ix = max(0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def test_mdrf_schema_matches_reference(reference_mdrf, rebuild_mdrf):
    """The MDRF interchange format must be field-compatible: a consumer of
    the reference's results.json (e.g. ClipToolkit, the MeteorMaster GUI)
    must be able to read ours."""
    assert sorted(reference_mdrf.keys()) == sorted(rebuild_mdrf.keys())
    ref_t = _meteor_targets(reference_mdrf)
    new_t = _meteor_targets(rebuild_mdrf)
    assert ref_t and new_t
    assert sorted(ref_t[0].keys()) == sorted(new_t[0].keys())
    # record-level schema
    ref_rec = reference_mdrf["results"][0]
    new_rec = rebuild_mdrf["results"][0]
    assert sorted(ref_rec.keys()) == sorted(new_rec.keys())


def test_detection_parity_with_reference(reference_mdrf, rebuild_mdrf):
    """Same events: one METEOR, overlapping time window, same geometry."""
    ref_t = _meteor_targets(reference_mdrf)
    new_t = _meteor_targets(rebuild_mdrf)
    assert len(ref_t) == len(new_t) == 1, (ref_t, new_t)
    r, n = ref_t[0], new_t[0]
    # temporal agreement (frames; HoughLinesP randomness + collector
    # accumulation allow edge wobble of a few frames)
    r0, r1 = r["start_frame"], r["last_activate_frame"]
    n0, n1 = n["start_frame"], n["last_activate_frame"]
    assert _tiou(r0, r1, n0, n1) >= 0.5, ((r0, r1), (n0, n1))
    # both must cover the true event (2.4-4.4s)
    for t0, t1 in ((r0, r1), (n0, n1)):
        assert _tiou(t0, t1, METEOR_T0 * FPS, METEOR_T1 * FPS) >= 0.5
    # spatial agreement (reference's own evaluate.py gate is IoU>=0.3,
    # evaluate.py:176-307)
    assert _box_iou(r, n) >= 0.3, (r, n)
    # score agreement: both confident
    assert r["score"] >= 0.5 and n["score"] >= 0.5


def test_json_serializable_both(reference_mdrf, rebuild_mdrf):
    json.dumps(reference_mdrf)
    json.dumps(rebuild_mdrf)
