"""Checkpoint/resume: a run interrupted mid-stream and resumed from its
checkpoint must produce the same detections as an uninterrupted run."""

import os

import numpy as np

os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")

from metdetpy_tpu.api import detect_video
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path

W, H, FPS = 192, 108, 25.0


def _cfg():
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = None
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    return cfg


def _meteors(frames_mdrf):
    return [(t.start_time, t.category)
            for rec in frames_mdrf.results for t in rec.target]


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    # kept within m3det_normal's speed_range at this tiny resolution: the
    # crowd-guarded Hough (ops/hough.py _find_peaks) measures the true
    # streak geometry, so an overly fast meteor would be (correctly)
    # classified OTHERS by the trapezoid speed score
    m = SynthMeteor(start_sec=2.8, end_sec=4.8,
                    pt1=(int(W * .70), int(H * .30)),
                    pt2=(int(W * .45), int(H * .62)))
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=6.0, meteors=[m],
                                   n_stars=25, noise_sigma=2.5)
    # full uninterrupted run
    full = detect_video(frames, None, _cfg(), work_mode="backend")
    assert any(t.category == "METEOR"
               for r in full.results for t in r.target)

    ckpt = str(tmp_path / "state.npz")
    # run the first 2.56s (one 64-frame block), checkpointing at the end
    first_half = frames[:64]
    detect_video(first_half, None, _cfg(), work_mode="backend",
                 checkpoint_path=ckpt, checkpoint_interval_sec=1e9)
    assert os.path.exists(ckpt)

    # resume on the full stream: loader seeks to the cursor, detector and
    # collector state restored
    resumed = detect_video(frames, None, _cfg(), work_mode="backend",
                           checkpoint_path=ckpt, resume=True,
                           checkpoint_interval_sec=1e9)
    got_full = _meteors(full)
    got_resumed = _meteors(resumed)
    meteor_full = [x for x in got_full if x[1] == "METEOR"]
    meteor_resumed = [x for x in got_resumed if x[1] == "METEOR"]
    assert len(meteor_resumed) == len(meteor_full) >= 1
    assert meteor_resumed[0][0] == meteor_full[0][0]  # same start time


def test_checkpoint_mldetector_state_roundtrip():
    """detector_state/restore_detector must carry MLDetector's rolling
    window-max history (LineDetector-specific keys are absent there)."""
    import numpy as np

    from metdetpy_tpu.checkpoint import detector_state, restore_detector
    from metdetpy_tpu.detectors.mldet import MLDetector
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.structs import DLCfg
    cfg = DLCfg.from_dict({"model": {
        "name": "YOLOModel", "weight_path": "weights/yolov5s_v5.flax.npz",
        "dtype": "float32", "nms": True, "warmup": False, "pos_thre": 0.25,
        "nms_thre": 0.45, "multiscale_pred": 0, "multiscale_partition": 2,
        "input_hw": "96x96"}})
    det = MLDetector(window_sec=1.0, fps=3.0,
                     mask=np.ones((24, 48, 3), np.uint8), num_cls=9,
                     cfg=cfg, logger=get_default_logger())
    rng = np.random.default_rng(0)
    det.process_block(rng.integers(0, 255, (4, 24, 48, 3), np.uint8))
    saved = detector_state(det)
    assert set(saved) == {"ml_hist"}
    hist_before = np.asarray(det._hist).copy()
    det.reset_device_state()
    assert not np.asarray(det._hist).any()
    restore_detector(det, saved)
    np.testing.assert_array_equal(np.asarray(det._hist), hist_before)
