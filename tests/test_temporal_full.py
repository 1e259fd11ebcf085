"""Full-detect-step temporal sharding: line-for-line equality with the
single-device pipeline (VERDICT r1 item 4; SURVEY.md §5.7).

A 2-meteor synthetic clip is processed (a) by the single-device fused
``_m3_block_step`` from stream start and (b) by ``temporal_m3_detect``
time-sharded over the 8-device CPU mesh with halo exchange. All outputs
(packed lines/stats buffer and the binarized dst block) must match
exactly -- the EMA all_gather design makes the sharded math identical,
not approximate.
"""

import numpy as np
import pytest

from metdetpy_tpu.detectors.m3det import EmaState, _m3_block_step
from metdetpy_tpu.parallel.mesh import build_mesh
from metdetpy_tpu.parallel.temporal import (temporal_m3_detect,
                                            temporal_window_stats)
from metdetpy_tpu.synth import SynthMeteor, generate_meteor_video

N = 6               # window frames
T = 64              # total block (8 shards x 8 local frames)
H, W = 96, 128
ROI = (36, 48, 60, 80)
PARAMS = dict(n=N, roi=ROI, dy_mask=True, mask_area=H * W,
              std_interval=2 * N, momentum=1 - 2 / 60,
              warmup_speed=float(N), adaptive=True, coef_a=1.2, coef_b=3.6,
              hough_threshold=6, min_len=6, max_gap=6.0, max_points=512,
              max_peaks=16)


@pytest.fixture(scope="module")
def clip():
    frames = generate_meteor_video(
        width=W, height=H, fps=25.0, duration_sec=T / 25.0,
        meteors=[
            SynthMeteor(0.4, 1.4, pt1=(int(W * 0.7), int(H * 0.2)),
                        pt2=(int(W * 0.4), int(H * 0.6))),
            SynthMeteor(1.2, 2.2, pt1=(int(W * 0.15), int(H * 0.75)),
                        pt2=(int(W * 0.45), int(H * 0.35))),
        ],
        n_stars=40, noise_sigma=3.0, seed=5)
    return np.asarray(frames[:T])


def _single_device(clip):
    import jax.numpy as jnp
    r1, c1, r2, c2 = ROI
    gray0 = jnp.zeros((N - 1, H, W), jnp.uint8)
    sub0 = jnp.zeros((N - 1, r2 - r1, c2 - c1), jnp.uint8)
    dy0 = jnp.zeros((N - 1, H, W), jnp.uint8)
    ema0 = EmaState.init(PARAMS["momentum"], 5.0)
    packed, dst, *_ = _m3_block_step(gray0, sub0, dy0, ema0,
                                     jnp.asarray(clip), np.int32(0),
                                     **PARAMS)
    return np.asarray(packed), np.asarray(dst)


def test_temporal_full_detect_matches_single_device(clip):
    mesh = build_mesh(8, axis_name="time")
    packed_ref, dst_ref = _single_device(clip)
    packed_sh, dst_sh = temporal_m3_detect(clip, mesh=mesh,
                                           axis_name="time",
                                           init_threshold=5.0, **PARAMS)
    packed_sh, dst_sh = np.asarray(packed_sh), np.asarray(dst_sh)
    # binarized/dy-masked block: exact
    np.testing.assert_array_equal(dst_ref, dst_sh)
    # packed lines + stats: exact (same integer window math, identical
    # f32 EMA scan, deterministic Hough)
    np.testing.assert_array_equal(packed_ref, packed_sh)


def test_temporal_full_detect_finds_both_meteors(clip):
    mesh = build_mesh(8, axis_name="time")
    packed, _ = temporal_m3_detect(clip, mesh=mesh, axis_name="time",
                                   init_threshold=5.0, **PARAMS)
    k = PARAMS["max_peaks"]
    valid = np.asarray(packed)[:, k * 4:k * 5] > 0.5
    frames_with_lines = np.where(valid.any(axis=1))[0]
    # lines must appear inside both meteors' active windows
    assert any(10 <= f <= 37 for f in frames_with_lines)
    assert any(32 <= f <= 57 for f in frames_with_lines)


def test_temporal_window_stats_cached_and_correct(clip):
    from metdetpy_tpu.parallel import temporal as tmod
    mesh = build_mesh(8, axis_name="time")
    tmod._build_window_stats_fn.cache_clear()
    stats = temporal_window_stats(clip, N, mesh=mesh, axis_name="time")
    stats2 = temporal_window_stats(clip, N, mesh=mesh, axis_name="time")
    info = tmod._build_window_stats_fn.cache_info()
    assert info.hits >= 1, "compiled shard_map program must be cached"
    # against the plain single-device window stats
    import jax.numpy as jnp
    from metdetpy_tpu.ops import windows
    ref, _ = windows.window_stats(
        jnp.zeros((N - 1, H, W), jnp.uint8), jnp.asarray(clip), N,
        np.int32(0))
    np.testing.assert_array_equal(np.asarray(ref.win_max),
                                  np.asarray(stats.win_max))
    np.testing.assert_array_equal(np.asarray(ref.diff),
                                  np.asarray(stats2.diff))


def test_detect_frames_temporal_end_to_end(clip):
    """The batch API: whole-clip detection through the time-sharded device
    program + host collector finds both meteors with correct windows."""
    from metdetpy_tpu.parallel.temporal import detect_frames_temporal
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import relative2abs_path
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    # match the clip's scale: small window + permissive hough like PARAMS
    cfg.detector.window_sec = N / 25.0
    cfg.detector.cfg.hough_line.threshold = PARAMS["hough_threshold"]
    cfg.detector.cfg.hough_line.min_len = PARAMS["min_len"]
    cfg.detector.cfg.hough_line.max_gap = PARAMS["max_gap"]
    cfg.collector.recheck_cfg.switch = False
    cfg.collector.meteor_cfg.min_len = 5
    # at this 128-px scale the normalized fix_speed (~43) exceeds the
    # production trapezoid cap (2*21); widen it -- this test validates the
    # sharded-device -> collector plumbing, not scoring calibration
    cfg.collector.meteor_cfg.speed_range = [2, 60]
    mesh = build_mesh(8, axis_name="time")
    records, used = detect_frames_temporal(
        clip, cfg, fps=25.0, mesh=mesh,
        max_points=PARAMS["max_points"], max_peaks=PARAMS["max_peaks"])
    assert used == T
    meteors = [t for r in records for t in r.target
               if t.category == "METEOR"]
    assert len(meteors) >= 1, records
    # detection must cover the first meteor's active window (0.4-1.4s)
    spans = [(t.start_frame, t.last_activate_frame) for t in meteors]
    assert any(s <= 35 and e >= 15 for s, e in spans), spans


def test_detect_video_temporal_cli_api(clip, tmp_path):
    """detect_video_temporal: video file -> loader -> time-sharded batch
    detection -> MDRF, through the MetDetPy CLI surface."""
    import sys
    from metdetpy_tpu.synth import write_video
    path = str(tmp_path / "clip.avi")
    write_video(clip, path, fps=25.0)

    import json
    import MetDetPy
    out = str(tmp_path / "out.json")
    # 2 shards: the halo constraint needs T/S >= n-1 (64-frame clip,
    # 25-frame window); --resize keeps the tiny clip at native scale
    argv = ["MetDetPy.py", path, "--mode", "backend",
            "--exp-time", "real-time", "--recheck", "off",
            "--resize", "128", "--temporal-shards", "2",
            "--save-path", out]
    old = sys.argv
    sys.argv = argv
    try:
        MetDetPy.main()
    finally:
        sys.argv = old
    with open(out) as f:
        mdrf = json.load(f)
    assert mdrf["type"] == "prediction"
    assert mdrf["basic_info"]["video"] == path
    # records list present (MJPG noise at this tiny scale may or may not
    # yield a METEOR; the surface contract is the MDRF round trip)
    assert isinstance(mdrf["results"], list)


def test_streaming_super_blocks_bit_equal_whole_clip(clip):
    """Chunked sharded detection with device-resident carries must be
    BIT-EQUAL to the whole-clip sharded run: same packed buffers and
    binarized blocks frame for frame across 4 super-blocks (VERDICT r2
    next #4)."""
    mesh = build_mesh(2, axis_name="time")
    packed_ref, dst_ref = temporal_m3_detect(
        clip, mesh=mesh, axis_name="time", init_threshold=5.0, **PARAMS)
    packed_ref = np.asarray(packed_ref)
    dst_ref = np.asarray(dst_ref)

    # 4 super-blocks of 16 frames (t_local = 8 >= n-1 = 5)
    carry = None
    packed_chunks = []
    dst_chunks = []
    for start in range(0, T, 16):
        packed_c, dst_c, carry = temporal_m3_detect(
            clip[start:start + 16], mesh=mesh, axis_name="time",
            init_threshold=5.0, carry=carry, return_carry=True, **PARAMS)
        packed_chunks.append(np.asarray(packed_c))
        dst_chunks.append(np.asarray(dst_c))
    assert len(packed_chunks) == 4
    np.testing.assert_array_equal(np.concatenate(dst_chunks), dst_ref)
    np.testing.assert_array_equal(np.concatenate(packed_chunks),
                                  packed_ref)


def test_streaming_driver_matches_whole_clip_records(clip):
    """detect_frames_temporal_streaming re-batching odd-sized input
    chunks into 3+ super-blocks produces the same records as
    detect_frames_temporal on the same frames."""
    from metdetpy_tpu.parallel.temporal import (
        detect_frames_temporal, detect_frames_temporal_streaming)
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import relative2abs_path
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.detector.window_sec = N / 25.0
    cfg.detector.cfg.hough_line.threshold = PARAMS["hough_threshold"]
    cfg.detector.cfg.hough_line.min_len = PARAMS["min_len"]
    cfg.detector.cfg.hough_line.max_gap = PARAMS["max_gap"]
    cfg.collector.recheck_cfg.switch = False
    cfg.collector.meteor_cfg.min_len = 5
    cfg.collector.meteor_cfg.speed_range = [2, 60]
    mesh = build_mesh(2, axis_name="time")
    records_ref, used_ref = detect_frames_temporal(
        clip, cfg, fps=25.0, mesh=mesh,
        max_points=PARAMS["max_points"], max_peaks=PARAMS["max_peaks"])

    def block_iter():
        # odd 12-frame chunks force re-batching across chunk boundaries
        for start in range(0, T, 12):
            yield clip[start:start + 12]

    records_st, used_st = detect_frames_temporal_streaming(
        block_iter(), cfg, fps=25.0, mesh=mesh, super_block_frames=16,
        max_points=PARAMS["max_points"], max_peaks=PARAMS["max_peaks"])
    assert used_ref == used_st == T
    assert len(records_ref) >= 1
    ref_d = [r.to_dict() for r in records_ref]
    st_d = [r.to_dict() for r in records_st]
    assert ref_d == st_d
