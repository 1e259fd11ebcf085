"""PyAVVideoWrapper PTS-repair + 2-stage-seek tests against a mocked av.

PyAV is absent from this image, but the wrapper's robustness logic
(reference MetLib/videowrapper.py:221-308) is pure host Python over the
av container API, so it is tested against a faithful fake: packets ->
frame lists with PTS, keyframe-granular backward seeks, per-container
read position.
"""

from fractions import Fraction

import numpy as np
import pytest

from metdetpy_tpu.io import videowrapper as vw

FPS = 25.0
TIME_BASE = Fraction(1, 12800)  # ticks/sec, like typical mp4 streams
TICKS_PER_FRAME = int(1 / FPS / TIME_BASE)  # 512


class FakeFrame:
    def __init__(self, pts, frame_id):
        self.pts = pts
        self.frame_id = frame_id

    def to_ndarray(self, format="bgr24"):
        return np.full((4, 4, 3), self.frame_id % 256, np.uint8)


class FakePacket:
    def __init__(self, frames, is_keyframe):
        self._frames = frames
        self.is_keyframe = is_keyframe

    def decode(self):
        return list(self._frames)


class FakeCodec:
    name = "h264"


class FakeCodecContext:
    codec = FakeCodec()


class FakeStream:
    def __init__(self, n_frames):
        self.average_rate = Fraction(25, 1)
        self.frames = n_frames
        self.width, self.height = 64, 48
        self.time_base = TIME_BASE
        self.thread_type = None
        self.codec_context = FakeCodecContext()


class FakeContainer:
    """Packet list + read cursor + keyframe-granular backward seek."""

    def __init__(self, pts_list, keyframe_every=8):
        self.packets = [
            FakePacket([FakeFrame(pts, i)], i % keyframe_every == 0)
            for i, pts in enumerate(pts_list)]
        self._cursor = 0
        n = len(pts_list)
        self.duration = int(n / FPS * 1e6)
        self.streams = type("S", (), {})()
        self.streams.video = [FakeStream(n)]
        self.streams.__class__.__getitem__ = (
            lambda s, i: s.video[i])
        self.closed = False

    def demux(self, stream=None, video=None):
        while self._cursor < len(self.packets):
            pkt = self.packets[self._cursor]
            self._cursor += 1
            yield pkt

    def seek(self, offset_us, any_frame=False, backward=True):
        # container-level seek in av.time_base (microseconds); land on the
        # latest keyframe at or before the target, like libav
        target_sec = offset_us / 1e6
        best = 0
        for i, pkt in enumerate(self.packets):
            f = pkt._frames[0]
            if f.pts is None:
                continue
            t = float(f.pts * TIME_BASE)
            if pkt.is_keyframe and t <= target_sec + 1e-9:
                best = i
        self._cursor = best

    def close(self):
        self.closed = True


class FakeAv:
    def __init__(self, container):
        self._container = container

    def open(self, name, **kwargs):
        return self._container


@pytest.fixture()
def patch_av(monkeypatch):
    def _install(container):
        monkeypatch.setattr(vw, "HAS_PYAV", True)
        monkeypatch.setattr(vw, "av", FakeAv(container))
        return vw.PyAVVideoWrapper("fake.mp4")
    return _install


def _healthy_pts(n):
    return [i * TICKS_PER_FRAME for i in range(n)]


def test_healthy_stream_reads_in_order(patch_av):
    w = patch_av(FakeContainer(_healthy_pts(30)))
    assert w.fps == 25.0
    assert w.num_frames == 30
    assert w.size == [64, 48]
    ids = []
    for _ in range(30):
        ok, frame = w.read()
        assert ok
        ids.append(int(frame[0, 0, 0]))
    assert ids == list(range(30))
    ok, frame = w.read()
    assert not ok and frame is None
    assert w.get_video_pos() == 30


def test_duplicate_repair_fills_pts_hole(patch_av):
    """A hole larger than the 0.5s tolerance (13 frames at 25fps) makes the
    wrapper repeat the previous frame instead of silently jumping ahead
    (reference MetLib/videowrapper.py:258-269)."""
    # frames 0..4 normal, then the stream jumps to frame 25
    pts = _healthy_pts(5) + [i * TICKS_PER_FRAME for i in range(25, 30)]
    w = patch_av(FakeContainer(pts))
    ids = []
    for _ in range(8):
        ok, frame = w.read()
        assert ok
        ids.append(int(frame[0, 0, 0]))
    # the first 5 real frames, then the hole is padded with frame 4's data
    assert ids[:5] == [0, 1, 2, 3, 4]
    assert ids[5] == 4  # duplicate of the last good frame
    assert ids[6] == 4


def test_drop_repair_skips_stale_frames(patch_av):
    """Frames whose PTS lag the logical counter by more than the tolerance
    are dropped (reference MetLib/videowrapper.py:246-257)."""
    # healthy 0..19, then the decoder re-emits stale frames 0..2
    # (pts behind by 20 > 13-frame tolerance), then resumes at 20
    pts = (_healthy_pts(20)
           + [0, TICKS_PER_FRAME, 2 * TICKS_PER_FRAME]
           + [i * TICKS_PER_FRAME for i in range(20, 24)])
    w = patch_av(FakeContainer(pts))
    ids = []
    while True:
        ok, frame = w.read()
        if not ok:
            break
        ids.append(int(frame[0, 0, 0]))
    # the stale re-emits (packet ids 20, 21, 22) must not appear
    assert ids == list(range(20)) + [23, 24, 25, 26]


def test_pts_none_frames_pass_through(patch_av):
    pts = [None, None, None]
    w = patch_av(FakeContainer(pts))
    for i in range(3):
        ok, frame = w.read()
        assert ok and int(frame[0, 0, 0]) == i
    assert w.get_video_pos() == 3


def test_two_stage_seek_lands_on_exact_frame(patch_av):
    """set_to does a keyframe-granular backward seek then decodes forward
    to the exact frame (reference MetLib/videowrapper.py:281-308)."""
    w = patch_av(FakeContainer(_healthy_pts(64), keyframe_every=8))
    assert w.set_to(21)
    assert w.get_video_pos() == 21
    ok, frame = w.read()
    assert ok
    # after the 2-stage roll-forward, the next decoded packet is the one
    # following the target (the seek consumed up to and including 21)
    assert int(frame[0, 0, 0]) >= 21
    assert w._frame_cache == []  # cache flushed on seek


def test_seek_to_zero_and_reread(patch_av):
    w = patch_av(FakeContainer(_healthy_pts(32), keyframe_every=8))
    for _ in range(10):
        w.read()
    w.set_to(0)
    assert w.get_video_pos() == 0
    ok, frame = w.read()
    assert ok and int(frame[0, 0, 0]) >= 0


def test_release_closes_container(patch_av):
    c = FakeContainer(_healthy_pts(4))
    w = patch_av(c)
    w.release()
    assert c.closed


def test_fallback_to_opencv_without_pyav(tmp_path):
    """Without PyAV the constructor transparently returns an OpenCV
    wrapper (so reference configs naming PyAVVideoWrapper still run)."""
    import cv2
    path = str(tmp_path / "tiny.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0,
                         (32, 24))
    for _ in range(5):
        wr.write(np.zeros((24, 32, 3), np.uint8))
    wr.release()
    assert not vw.HAS_PYAV
    w = vw.PyAVVideoWrapper(path)
    assert isinstance(w, vw.OpenCVVideoWrapper)
    w.release()
