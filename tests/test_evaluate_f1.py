"""F1-parity harness against ground-truth annotation (SURVEY.md §4): detect
on a synthetic annotated clip and compare via evaluate.compare in gt mode --
the rebuild's analog of the reference's annotation regression flow."""

import json
import os

import numpy as np
import pytest

os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MDRF, MainDetectCfg, from_dict
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video, write_video
from metdetpy_tpu.utils import frame2ts, relative2abs_path, ts2frame

W, H, FPS = 256, 144, 25.0
GT_START, GT_END = 2.4, 4.4
GT_PT1 = (int(W * 0.45), int(H * 0.25))
GT_PT2 = (int(W * 0.30), int(H * 0.55))


def _annotation_mdrf(video_path: str) -> dict:
    """Ground truth in MDRF form (type=annotation), the format evaluate
    consumes for metric mode."""
    sf, ef = int(GT_START * FPS), int(GT_END * FPS)
    target = {
        "start_frame": sf, "start_time": frame2ts(sf, FPS),
        "end_time": frame2ts(ef, FPS), "last_activate_frame": ef,
        "last_activate_time": frame2ts(ef, FPS), "duration": ef - sf + 1,
        "speed": 1.0, "dist": 50.0, "fix_dist": 20.0, "fix_speed": 10.0,
        "fix_motion_duration": GT_END - GT_START,
        "fix_duration": GT_END - GT_START, "num_pts": 2,
        "category": "METEOR", "pt1": list(GT_PT1), "pt2": list(GT_PT2),
        "drct_loss": 0.0, "score": 1.0, "real_dist": 50.0,
    }
    return {
        "version": "anno", "basic_info": {
            "loader": "none", "video": video_path, "mask": None,
            "start_time": 0, "end_time": int(6500 / FPS * 1000),
            "resolution": [W, H], "runtime_resolution": [W, H],
            "exp_time": 1 / FPS, "total_frames": int(6.5 * FPS), "fps": FPS,
        },
        "config": None, "type": "annotation", "anno_size": [W, H],
        "results": [{
            "start_time": frame2ts(sf, FPS), "end_time": frame2ts(ef, FPS),
            "video_size": [W, H], "target": [target],
            "start_frame": sf, "end_frame": ef,
        }],
    }


def test_f1_parity_on_annotated_synthetic_clip(tmp_path, capsys):
    meteor = SynthMeteor(start_sec=GT_START, end_sec=GT_END, pt1=GT_PT1,
                         pt2=GT_PT2)
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=6.5, meteors=[meteor],
                                   n_stars=40, noise_sigma=3.0)
    # MJPG avi: mp4v at this tiny resolution produces structured DCT
    # artifacts that read as false lines
    video_path = str(tmp_path / "synth.avi")
    write_video(frames, video_path, fps=FPS)

    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    result = detect_video(video_path, None, cfg, work_mode="backend")

    from evaluate import compare
    from metdetpy_tpu.io.videowrapper import OpenCVVideoWrapper
    video = OpenCVVideoWrapper(video_path)
    anno = from_dict(MDRF, _annotation_mdrf(video_path))
    compare(video, base_dict=anno, new_dict=result)
    video.release()
    out = capsys.readouterr().out
    # strict recall: the annotated meteor must be matched
    assert "'recall': 1.0" in out, out
    import re
    prec = float(re.search(r"'precision': ([0-9.]+)", out).group(1))

    # Precision is anchored to the UNMODIFIED reference on the identical
    # clip+config rather than an absolute bar: this deliberately
    # re-encoded tiny fixture contains persistent collinear codec-flicker
    # structures that the reference itself reports as confident METEOR
    # tracks (measured 2026-08-20: reference precision 1/3 here, same two
    # extra tracks at the same coordinates) -- an absolute >=0.5 bar
    # would demand BETTER-than-reference noise rejection, which the old
    # theta-order peak compaction only achieved by blacking out saturated
    # frames (the m3det_low mid-event blackout fixed by the hough crowd
    # guard). The uncompressed in-memory path asserts exactness in
    # test_e2e_detect.py.
    import test_reference_parity as refpar
    ref_dict = refpar._run_reference(video_path, "m3det_normal", None,
                                     None, seed=1234, resize=None)
    # reference run uses its own resize default; pin to the raw size the
    # rebuild ran at by re-running compare on the reference MDRF
    video = OpenCVVideoWrapper(video_path)
    compare(video, base_dict=anno, new_dict=from_dict(MDRF, ref_dict))
    video.release()
    ref_out = capsys.readouterr().out
    ref_prec = float(
        re.search(r"'precision': ([0-9.]+)", ref_out).group(1))
    assert prec >= ref_prec - 1e-9, (
        f"rebuild precision {prec} < reference precision {ref_prec}\n"
        f"rebuild:\n{out}\nreference:\n{ref_out}")
