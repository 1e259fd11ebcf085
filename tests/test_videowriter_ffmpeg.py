"""FFMpegVideoWriter logic tests against FAKE ffmpeg/ffprobe executables.

The real binaries are absent in this image, so the subprocess surface is
exercised with recording shims: each fake logs its argv (JSON lines) and
emits canned probe output driven by env vars. This covers the keyframe
2-stage-seek estimation with widening retries, the audio-codec probe
fallbacks, and the full command construction of both export paths
(reference MetLib/videowriter.py:300-605) without ffmpeg installed.
"""

import json
import os
import stat
import sys

import numpy as np
import pytest

from metdetpy_tpu.io.videowriter import FFMpegVideoWriter
from metdetpy_tpu.log import BaseMetLog
from metdetpy_tpu.structs import ExportOption

FFPROBE_SRC = r'''#!/usr/bin/env python3
import json, os, sys
argv = sys.argv[1:]
with open(os.environ["FAKE_LOG"], "a") as f:
    f.write(json.dumps(["ffprobe"] + argv) + "\n")
if "-version" in argv:
    sys.exit(0)
if "stream=codec_name" in argv:
    codec = os.environ.get("FAKE_AUDIO_CODEC", "")
    if codec:
        print(codec)
    sys.exit(0)
if "frame=key_frame,pkt_pts_time" in argv:
    interval = argv[argv.index("-read_intervals") + 1]
    lo, hi = (float(x) for x in interval.split("%"))
    kfs = [float(x) for x in os.environ.get("FAKE_KEYFRAMES", "").split(",")
           if x]
    for k in sorted(kfs):
        if lo <= k <= hi:
            print(f"0,{k + 0.01:.3f}")   # a non-key frame line
            print(f"1,{k:.3f}")
    sys.exit(0)
sys.exit(0)
'''

FFMPEG_SRC = r'''#!/usr/bin/env python3
import json, os, sys
argv = sys.argv[1:]
with open(os.environ["FAKE_LOG"], "a") as f:
    f.write(json.dumps(["ffmpeg"] + argv) + "\n")
if "-version" in argv:
    sys.exit(0)
out = argv[-1]
with open(out, "wb") as f:
    f.write(b"fake")
sys.exit(int(os.environ.get("FAKE_FFMPEG_RC", "0")))
'''


class _Loader:
    """Metadata-only loader stub (the ffmpeg path never decodes)."""

    def __init__(self, video_name, fps=25.0, start_frame=0, end_frame=250):
        self.video_name = video_name
        self.fps = fps
        self.start_frame = start_frame
        self.end_frame = end_frame

    def reset(self, start_frame=None, end_frame=None):
        pass


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    """Install recording ffmpeg/ffprobe shims; returns (export_option,
    read_log) where read_log() yields the recorded argv lists."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.jsonl"
    for name, src in (("ffprobe", FFPROBE_SRC), ("ffmpeg", FFMPEG_SRC)):
        p = bindir / name
        p.write_text(src.replace("#!/usr/bin/env python3",
                                 f"#!{sys.executable}"))
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("FAKE_LOG", str(log))
    monkeypatch.setenv("FAKE_KEYFRAMES", "")
    monkeypatch.setenv("FAKE_AUDIO_CODEC", "")
    opt = ExportOption()
    opt.ffmpeg_config.ffmpeg_path = str(bindir / "ffmpeg")
    opt.ffmpeg_config.ffprobe_path = str(bindir / "ffprobe")

    def read_log():
        if not log.exists():
            return []
        return [json.loads(line) for line in log.read_text().splitlines()]

    return opt, read_log


def _probe_calls(calls, kind):
    return [c for c in calls if c[0] == kind and "-version" not in c]


def test_availability_via_fake_binaries(fake_ffmpeg):
    opt, _ = fake_ffmpeg
    assert FFMpegVideoWriter.available(opt)
    opt.ffmpeg_config.ffmpeg_path = "/nonexistent/ffmpeg"
    assert not FFMpegVideoWriter.available(opt)


def test_keyframe_estimate_picks_latest_before_start(fake_ffmpeg,
                                                     monkeypatch):
    opt, read_log = fake_ffmpeg
    monkeypatch.setenv("FAKE_KEYFRAMES", "0.0,4.0,8.0,12.0")
    k = FFMpegVideoWriter._estimate_k_frame(
        opt.ffmpeg_config.ffprobe_path, "in.mp4", 10.0, BaseMetLog())
    assert k == pytest.approx(8.0)
    assert len(_probe_calls(read_log(), "ffprobe")) == 1


def test_keyframe_estimate_widening_retry(fake_ffmpeg, monkeypatch):
    """Start=10 with the only keyframe at 3.0: the 2s window misses, the
    4s window (sliding back) misses, the 8s window finds it."""
    opt, read_log = fake_ffmpeg
    monkeypatch.setenv("FAKE_KEYFRAMES", "3.0")
    k = FFMpegVideoWriter._estimate_k_frame(
        opt.ffmpeg_config.ffprobe_path, "in.mp4", 10.0, BaseMetLog())
    assert k == pytest.approx(3.0)
    probes = _probe_calls(read_log(), "ffprobe")
    assert len(probes) == 3
    # widening look-back windows: ~[8,10], ~[4,8], ~[0,4]
    intervals = [p[p.index("-read_intervals") + 1] for p in probes]
    lohi = [tuple(float(x) for x in iv.split("%")) for iv in intervals]
    assert lohi[0] == pytest.approx((8.0, 10.0), abs=0.01)
    assert lohi[1] == pytest.approx((4.0, 8.0), abs=0.01)
    assert lohi[2] == pytest.approx((0.0, 4.0), abs=0.01)


def test_keyframe_estimate_heuristic_fallback(fake_ffmpeg):
    """No keyframes found after max retries -> K = S - 2s."""
    opt, read_log = fake_ffmpeg
    k = FFMpegVideoWriter._estimate_k_frame(
        opt.ffmpeg_config.ffprobe_path, "in.mp4", 10.0, BaseMetLog())
    assert k == pytest.approx(8.0)
    assert len(_probe_calls(read_log(), "ffprobe")) == 5


@pytest.mark.parametrize("codec,target,expected", [
    ("aac", "out.mp4", ["-c:a", "copy"]),
    ("opus", "out.mp4", ["-c:a", "aac", "-b:a", "192k"]),
    ("pcm_s16le", "out.avi", ["-c:a", "copy"]),
    ("pcm_s16le", "out.webm", ["-c:a", "vorbis", "-b:a", "192k"]),
    ("", "out.mp4", ["-c:a", "copy"]),          # no audio stream
])
def test_audio_codec_probe_fallbacks(fake_ffmpeg, monkeypatch, codec,
                                     target, expected):
    opt, _ = fake_ffmpeg
    monkeypatch.setenv("FAKE_AUDIO_CODEC", codec)
    args = FFMpegVideoWriter._get_audio_args(
        opt.ffmpeg_config.ffprobe_path, "in.mp4", target)
    assert args == expected


def test_save_by_stream_command_construction(fake_ffmpeg, monkeypatch,
                                             tmp_path):
    """Coarse keyframe seek before -i, precise seek after, transcode args
    from the ffmpeg config, probed audio handling, -avoid_negative_ts."""
    opt, read_log = fake_ffmpeg
    monkeypatch.setenv("FAKE_KEYFRAMES", "1.0,2.0")
    monkeypatch.setenv("FAKE_AUDIO_CODEC", "opus")
    out = str(tmp_path / "clip.mp4")
    loader = _Loader("source.mp4", fps=25.0)
    rc = FFMpegVideoWriter.save_video_by_stream(
        loader, opt, out, start_frame=60, end_frame=120,
        logger=BaseMetLog())
    assert rc == 0
    (cmd,) = _probe_calls(read_log(), "ffmpeg")
    # s = 60/25 = 2.4; keyframe K = 2.0; precise seek = 0.4; t = 2.4
    i = cmd.index("-i")
    assert cmd[i - 2:i + 2] == ["-ss", "2.000", "-i", "source.mp4"]
    j = cmd.index("-ss", i)
    assert cmd[j:j + 4] == ["-ss", "0.400", "-t", "2.400"]
    assert cmd[cmd.index("-c:v") + 1] == "libx264"
    assert cmd[cmd.index("-crf") + 1] == "18"
    assert cmd[cmd.index("-pix_fmt") + 1] == "yuv420p"
    a = cmd.index("-c:a")
    assert cmd[a:a + 4] == ["-c:a", "aac", "-b:a", "192k"]  # opus -> mp4
    assert "-avoid_negative_ts" in cmd
    assert cmd[-1] == out and os.path.exists(out)


def test_save_with_audio_mux_command(fake_ffmpeg, monkeypatch, tmp_path):
    """Temp AVI as input 0, seeked/trimmed source as input 1, explicit
    stream maps with optional audio."""
    opt, read_log = fake_ffmpeg
    monkeypatch.setenv("FAKE_AUDIO_CODEC", "mp3")
    out = str(tmp_path / "clip.mp4")
    frames = [np.zeros((16, 16, 3), np.uint8) for _ in range(12)]
    loader = _Loader("source.mp4", fps=25.0)
    rc = FFMpegVideoWriter.save_video_with_audio(
        frames, loader, opt, out, start_frame=50, end_frame=62,
        logger=BaseMetLog())
    assert rc == 0
    (cmd,) = _probe_calls(read_log(), "ffmpeg")
    # input 0 = temp avi; input 1 = source with -ss/-t INPUT options
    i0 = cmd.index("-i")
    assert cmd[i0 + 1].endswith(".avi")
    i1 = cmd.index("-i", i0 + 1)
    assert cmd[i1 + 1] == "source.mp4"
    assert cmd[i1 - 4:i1] == ["-ss", "00:00:02.000", "-t", "0.480"]
    m = cmd.index("-map")
    assert cmd[m:m + 4] == ["-map", "0:v:0", "-map", "1:a:0?"]
    a = cmd.index("-c:a")
    assert cmd[a:a + 2] == ["-c:a", "copy"]  # mp3 accepted by mp4
    assert os.path.exists(out)


def test_ffmpeg_failure_is_reported(fake_ffmpeg, monkeypatch, tmp_path):
    opt, _ = fake_ffmpeg
    monkeypatch.setenv("FAKE_KEYFRAMES", "0.0")
    monkeypatch.setenv("FAKE_FFMPEG_RC", "1")
    loader = _Loader("source.mp4", fps=25.0)
    rc = FFMpegVideoWriter.save_video_by_stream(
        loader, opt, str(tmp_path / "clip.mp4"), start_frame=0,
        end_frame=50, logger=BaseMetLog())
    assert rc == -1
