"""Time-sharded dldet (parallel/temporal_dldet.py): the MLDetector
pipeline with the clip's time axis sharded over an 8-device mesh must
produce exactly the sequential block loop's results — whole-clip and
streaming super-block modes."""

import os

import numpy as np
import pytest

os.environ.setdefault("METDETPY_TPU_MAX_POINTS", "2048")

import jax

from metdetpy_tpu.api import detect_video, detect_video_temporal
from metdetpy_tpu.structs import MainDetectCfg
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import relative2abs_path

W, H, FPS = 640, 360, 25.0  # trained-weight scene scale (320px analysis)


@pytest.fixture(scope="module")
def color_frames():
    m = SynthMeteor(start_sec=1.2, end_sec=2.6,
                    pt1=(int(W * .7), int(H * .25)),
                    pt2=(int(W * .3), int(H * .6)))
    frames = generate_meteor_video(width=W, height=H, fps=FPS,
                                   duration_sec=4.3, meteors=[m],
                                   n_stars=40, color=True)
    return frames[:104]  # divisible by 8: sharded run sees every frame


def _cfg():
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/dldet.json"))
    cfg.loader.name = "BlockVideoLoader"
    cfg.loader.wrapper = "NumpyVideoWrapper"
    cfg.loader.resize = 320
    cfg.loader.exp_time = "real-time"
    cfg.collector.recheck_cfg.switch = False
    # n = 5-frame window: keeps the (n-1)-frame halo within each
    # 13-frame shard (and within 5-frame super-block shards)
    cfg.detector.window_sec = 0.2
    # single-scale forward: one batched 320x320 call per run (the
    # trained weights detect at this scale; see bench_dldet)
    cfg.detector.cfg.model.multiscale_pred = 0
    return cfg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_temporal_dldet_matches_sequential(color_frames):
    seq = detect_video(color_frames, None, _cfg(), work_mode="backend")
    shd = detect_video_temporal(color_frames, None, _cfg(), n_shards=8,
                                work_mode="backend")
    seq_recs = [r.to_dict() for r in seq.results]
    shd_recs = [r.to_dict() for r in shd.results]
    assert shd_recs == seq_recs
    assert any(t.category == "METEOR"
               for r in shd.results for t in r.target), (
        "the sharded run must still find the meteor")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_temporal_dldet_streaming_matches_whole_clip(color_frames):
    """Super-block streaming (device-resident window-tail carry between
    sharded steps) must be bit-equal to the whole-clip sharded run over
    a clip spanning >= 2 super-blocks."""
    clip = color_frames[:101]  # NOT divisible by 8: tail pad path
    whole = detect_video_temporal(clip, None, _cfg(), n_shards=8,
                                  work_mode="backend")
    streaming = detect_video_temporal(
        clip, None, _cfg(), n_shards=8, work_mode="backend",
        super_block_sec=40 / FPS)  # 40-frame super-blocks + padded tail
    assert ([r.to_dict() for r in streaming.results]
            == [r.to_dict() for r in whole.results])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_temporal_dldet_clip_shorter_than_mesh(color_frames):
    """A clip with fewer frames than the shard count must still process
    every frame (pad + trim), matching the sequential path."""
    clip = color_frames[30:35]  # 5 frames on an 8-device mesh
    seq = detect_video(clip, None, _cfg(), work_mode="backend")
    shd = detect_video_temporal(clip, None, _cfg(), n_shards=8,
                                work_mode="backend")
    assert ([r.to_dict() for r in shd.results]
            == [r.to_dict() for r in seq.results])
