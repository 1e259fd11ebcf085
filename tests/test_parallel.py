"""Multi-chip sharding tests on the virtual 8-device CPU mesh: stream
sharding (one feed per device) and temporal sharding with halo exchange."""

import numpy as np
import pytest

from metdetpy_tpu.log import BaseMetLog
from metdetpy_tpu.parallel.mesh import build_mesh
from metdetpy_tpu.parallel.multistream import MultiStreamM3Detector
from metdetpy_tpu.parallel.temporal import temporal_window_stats
from metdetpy_tpu.structs import (BinaryCfg, BinaryCoreCfg, DynamicCfg,
                                  HoughLineCfg)
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video
from metdetpy_tpu.utils import get_num_class


def _bin_cfg():
    return BinaryCfg(
        binary=BinaryCoreCfg(adaptive_bi_thre=True, init_value=5,
                             sensitivity="normal", area=0.1, interval=2),
        hough_line=HoughLineCfg(threshold=10, min_len=10, max_gap=10),
        dynamic=DynamicCfg(dy_mask=True, window_sec=5))


def test_temporal_sharding_matches_single_device(rng):
    n = 4
    frames = rng.integers(0, 256, size=(32, 16, 24), dtype=np.uint8)
    mesh = build_mesh(8, axis_name="time")
    stats = temporal_window_stats(frames, n, mesh=mesh)

    # oracle: unsharded rolling stats
    from metdetpy_tpu.ops import windows
    hist = np.zeros((n - 1, 16, 24), np.uint8)
    ref, _ = windows.window_stats(hist, frames, n, np.int32(0))
    np.testing.assert_array_equal(np.asarray(stats.win_max),
                                  np.asarray(ref.win_max))
    np.testing.assert_array_equal(np.asarray(stats.win_mean),
                                  np.asarray(ref.win_mean))


def test_multistream_detects_meteor_in_one_stream():
    """8 streams on 8 devices: only stream 3 contains a meteor; the sharded
    detector must report lines only (mostly) there."""
    w, h, fps = 128, 96, 25.0
    streams = []
    for s in range(8):
        meteors = [SynthMeteor(0.6, 1.8, (int(w * .8), int(h * .2)),
                               (int(w * .2), int(h * .8)))] if s == 3 else \
                  [SynthMeteor(99, 100, (0, 0), (1, 1))]
        streams.append(generate_meteor_video(
            width=w, height=h, fps=fps, duration_sec=2.56, meteors=meteors,
            n_stars=15, noise_sigma=2.5, seed=100 + s))
    blocks = np.stack(streams)  # [8, 64, H, W]
    mesh = build_mesh(8, axis_name="stream")
    det = MultiStreamM3Detector(8, window_sec=0.4, fps=fps,
                                mask=np.ones((h, w), np.uint8),
                                num_cls=get_num_class(), cfg=_bin_cfg(),
                                logger=BaseMetLog(), mesh=mesh,
                                max_points=2048, max_peaks=16)
    per_stream = det.process_blocks(blocks)
    line_counts = [sum(len(lines) for lines, _ in res)
                   for res in per_stream]
    assert line_counts[3] >= 3, line_counts
    others = sum(c for i, c in enumerate(line_counts) if i != 3)
    assert line_counts[3] > others, line_counts
