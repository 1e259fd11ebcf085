"""MetDetPhoto CLI smoke tests (single image + folder modes, random
weights, small model input)."""

import json
import os
import sys

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(3)
    for i in range(3):
        img = rng.integers(0, 40, (96, 128, 3), np.uint8)
        cv2.line(img, (20, 20), (100, 70), (250, 250, 250), 2)
        cv2.imwrite(str(d / f"img_{i}.jpg"), img)
    return d


def _run(argv, monkeypatch):
    monkeypatch.setenv("METDETPY_TPU_YOLO_HW", "96x96")
    import MetDetPhoto
    old = sys.argv
    sys.argv = argv
    try:
        MetDetPhoto.main()
    finally:
        sys.argv = old


def test_single_image_mode(img_dir, tmp_path, monkeypatch):
    out = tmp_path / "res.json"
    _run(["MetDetPhoto.py", str(img_dir / "img_0.jpg"), "--scale", "0",
          "--save-path", str(out)], monkeypatch)
    data = json.loads(out.read_text())
    assert data["type"] == "image-prediction"
    assert isinstance(data["results"], list)


def test_folder_mode(img_dir, tmp_path, monkeypatch):
    out = tmp_path / "res.json"
    _run(["MetDetPhoto.py", str(img_dir), "--scale", "0",
          "--save-path", str(out)], monkeypatch)
    data = json.loads(out.read_text())
    assert data["type"] == "image-prediction"
    assert data["basic_info"]["image_folder"] == str(img_dir)


def test_timelapse_video_mode(tmp_path, monkeypatch):
    from metdetpy_tpu.synth import generate_meteor_video, write_video, SynthMeteor
    frames = generate_meteor_video(width=128, height=96, fps=25.0,
                                   duration_sec=1.0,
                                   meteors=[SynthMeteor(99, 100, (0, 0),
                                                        (1, 1))],
                                   n_stars=10, color=True)
    vid = tmp_path / "tl.avi"
    write_video(frames, str(vid), fps=25.0)
    out = tmp_path / "res.json"
    _run(["MetDetPhoto.py", str(vid), "--scale", "0", "--exclude-noise",
          "--save-path", str(out)], monkeypatch)
    data = json.loads(out.read_text())
    assert data["type"] == "timelapse-prediction"
    for rec in data["results"]:
        assert "num_frame" in rec

def test_single_image_detection_quality(tmp_path, monkeypatch):
    """With the shipped trained weights, a gaussian streak on a star field
    must be reported as a METEOR box overlapping the trail."""
    from metdetpy_tpu.synth import _draw_gaussian_dot
    rng = np.random.default_rng(11)
    img = np.full((320, 320), 12.0, np.float32)
    for _ in range(20):
        _draw_gaussian_dot(img, rng.uniform(0, 320), rng.uniform(0, 320),
                           rng.uniform(25, 200), rng.uniform(0.8, 1.5))
    x1, y1, x2, y2 = 90.0, 60.0, 170.0, 130.0
    steps = 220
    for k in range(steps):
        a = k / (steps - 1)
        _draw_gaussian_dot(img, x1 + (x2 - x1) * a, y1 + (y2 - y1) * a,
                           200.0 * (1 - 0.3 * a), 1.6)
    img = img + rng.normal(0, 3, img.shape)
    u8 = np.repeat(np.clip(img, 0, 255).astype(np.uint8)[..., None], 3, -1)
    path = tmp_path / "streak.png"
    cv2.imwrite(str(path), u8)
    out = tmp_path / "res.json"
    import MetDetPhoto
    old = sys.argv
    sys.argv = ["MetDetPhoto.py", str(path), "--scale", "1",
                "--save-path", str(out)]
    try:
        MetDetPhoto.main()
    finally:
        sys.argv = old
    data = json.loads(out.read_text())
    assert len(data["results"]) == 1
    rec = data["results"][0]
    meteor_boxes = [b for b, p in zip(rec["boxes"], rec["preds"])
                    if p == "METEOR"]
    assert meteor_boxes, rec
    # at least one METEOR box overlaps the streak bbox
    assert any(b[0] < x2 and b[2] > x1 and b[1] < y2 and b[3] > y1
               for b in meteor_boxes), meteor_boxes
