"""MJPG-AVI demuxer + libjpeg scaled decode (decode at analysis resolution).

Covers: the pure-python RIFF/idx1 demuxer against OpenCV's own metadata,
decode equality with the FFmpeg path, seek semantics, the loader's
auto-upgrade gate, and DETECTION parity between the scaled-decode path
and the full-decode + resize path on a synthetic annotated meteor clip
(pixel values shift slightly between the two downsample filters, so
parity is asserted on detected events, not bits -- the gate the upgrade
ships behind, see videoloader._maybe_scaled_decode).
"""

import os

import cv2
import numpy as np
import pytest

os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")

from metdetpy_tpu.io.mjpgavi import MJPGAVIVideoWrapper, parse_avi
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path, ts2frame

W, H, FPS = 1280, 720, 25.0


def _write_mjpg(path, frames, fps=FPS):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                        fps, (frames.shape[2], frames.shape[1]))
    assert w.isOpened()
    for f in frames:
        w.write(np.ascontiguousarray(
            np.repeat(f[..., None], 3, axis=2) if f.ndim == 2 else f))
    w.release()


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    meteor = SynthMeteor(start_sec=2.4, end_sec=4.4,
                         pt1=(int(W * 0.45), int(H * 0.25)),
                         pt2=(int(W * 0.30), int(H * 0.55)))
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=6.5, meteors=[meteor],
                                   n_stars=60, noise_sigma=3.0)
    path = tmp_path_factory.mktemp("mjpg") / "clip.avi"
    _write_mjpg(path, frames)
    return str(path), frames


@pytest.mark.smoke
def test_demux_matches_opencv_metadata(clip):
    path, frames = clip
    wrap = MJPGAVIVideoWrapper(path)
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    assert wrap.num_frames == int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) \
        == frames.shape[0]
    assert wrap.size == [int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                         int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))]
    assert wrap.fps == pytest.approx(cap.get(cv2.CAP_PROP_FPS), abs=0.01)
    cap.release()
    wrap.release()


@pytest.mark.smoke
def test_fullscale_decode_matches_ffmpeg(clip):
    """Same JPEG bitstream through libjpeg vs FFmpeg: near-identical."""
    path, _ = clip
    wrap = MJPGAVIVideoWrapper(path)
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    for _ in range(3):
        ok_a, a = wrap.read()
        ok_b, b = cap.read()
        assert ok_a and ok_b
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.mean() < 1.0 and diff.max() <= 16
    cap.release()
    wrap.release()


@pytest.mark.smoke
def test_scaled_decode_and_seek(clip):
    path, _ = clip
    wrap = MJPGAVIVideoWrapper(path)
    ds = wrap.set_decode_scale((640, 360))
    assert ds == [640, 360] and wrap.decode_size == [640, 360]
    assert wrap.size == [W, H]  # true size unchanged (MDRF metadata)
    ok, f = wrap.read()
    assert ok and f.shape == (360, 640, 3)
    # grayscale luma decode
    wrap.set_decode_scale((640, 360), grayscale=True)
    wrap.set_to(5)
    ok, g5 = wrap.read()
    assert ok and g5.shape == (360, 640) and wrap.get_video_pos() == 6
    # seek is frame-exact: re-read frame 5 after a rewind
    wrap.set_to(0)
    for _ in range(5):
        wrap.read()
    ok, g5b = wrap.read()
    np.testing.assert_array_equal(g5, g5b)
    # a too-large target falls back to full-size decode
    assert wrap.set_decode_scale((1000, 700)) == [W, H]
    wrap.release()


@pytest.mark.smoke
def test_parse_avi_sequential_fallback(clip):
    """Demux still works when the idx1 index is withheld."""
    path, frames = clip
    data = bytearray(open(path, "rb").read())
    i = data.rfind(b"idx1")
    data[i:i + 4] = b"JUNK"  # index unreadable -> movi scan
    info = parse_avi(bytes(data))
    assert len(info.chunks) == frames.shape[0]
    assert (info.width, info.height) == (W, H)


def _detect(path, scaled: str):
    from metdetpy_tpu.api import detect_video
    from metdetpy_tpu.structs import MainDetectCfg
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "OpenCVVideoWrapper"
    cfg.loader.resize = 640
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    prev = os.environ.get("METDETPY_TPU_SCALED_DECODE")
    os.environ["METDETPY_TPU_SCALED_DECODE"] = scaled
    try:
        return detect_video(path, None, cfg, work_mode="backend")
    finally:
        if prev is None:
            del os.environ["METDETPY_TPU_SCALED_DECODE"]
        else:
            os.environ["METDETPY_TPU_SCALED_DECODE"] = prev


@pytest.mark.slow
def test_loader_upgrade_and_detection_parity(clip):
    """The auto-upgraded scaled-decode path finds the same meteor as the
    full-decode path (the detection-parity gate for shipping the upgrade
    default-on)."""
    path, _ = clip
    events = {}
    for scaled in ("1", "0"):
        mdrf = _detect(path, scaled)
        mets = [t for rec in mdrf.results for t in rec.target
                if t.category == "METEOR"]
        assert len(mets) >= 1, f"scaled={scaled}: no METEOR found"
        events[scaled] = max(mets, key=lambda t: t.score)
    a, b = events["1"], events["0"]
    assert abs(ts2frame(a.start_time, FPS) - ts2frame(b.start_time, FPS)) \
        <= int(FPS)
    for pa, pb in ((a.pt1, b.pt1), (a.pt2, b.pt2)):
        assert abs(pa[0] - pb[0]) <= 24 and abs(pa[1] - pb[1]) <= 24, \
            (a.__dict__, b.__dict__)


@pytest.mark.smoke
def test_loader_upgrade_reports_decode_size(clip):
    path, _ = clip
    from metdetpy_tpu.io.videoloader import BlockVideoLoader
    from metdetpy_tpu.io.videowrapper import OpenCVVideoWrapper
    loader = BlockVideoLoader(
        OpenCVVideoWrapper, path, resize_option=640, grayscale=True,
        exp_option="real-time", merge_func="max")
    try:
        assert loader.decode_size == [640, 360]
        assert isinstance(loader.video, MJPGAVIVideoWrapper)
        assert loader.raw_size == [W, H]
        assert loader.summary().resolution == [W, H]
    finally:
        loader.release()
    prev = os.environ.get("METDETPY_TPU_SCALED_DECODE")
    os.environ["METDETPY_TPU_SCALED_DECODE"] = "0"
    try:
        loader = BlockVideoLoader(
            OpenCVVideoWrapper, path, resize_option=640, grayscale=True,
            exp_option="real-time", merge_func="max")
        assert loader.decode_size == [W, H]
        assert isinstance(loader.video, OpenCVVideoWrapper)
        loader.release()
    finally:
        if prev is None:
            del os.environ["METDETPY_TPU_SCALED_DECODE"]
        else:
            os.environ["METDETPY_TPU_SCALED_DECODE"] = prev
