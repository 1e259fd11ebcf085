"""Concurrency/robustness: the exporter thread under bursty load, the
native ring with multiple producers, and loader stop/timeout behavior
(SURVEY.md §5.2: the reference's thread-safety is ad-hoc; these pin ours).
"""

import threading
import time

import numpy as np

from metdetpy_tpu.log import BaseMetLog
from metdetpy_tpu.structs import (MeteorCfg, ModelCfg, RecheckCfg,
                                  RuntimeParams)
from metdetpy_tpu.track.exporter import MetExporter
from metdetpy_tpu.utils import frame2ts


def _rt():
    return RuntimeParams(fps=25.0, exp_frame=1, eq_fps=25.0, eq_int_fps=25,
                         exp_time=0.04, runtime_size=[192, 108],
                         raw_size=[384, 216],
                         positive_category_list=["METEOR"])


def _target(start_frame):
    from metdetpy_tpu.structs import MDTarget
    return MDTarget(
        start_frame=start_frame, start_time=frame2ts(start_frame, 25.0),
        end_time=frame2ts(start_frame + 10, 25.0),
        last_activate_frame=start_frame + 10,
        last_activate_time=frame2ts(start_frame + 10, 25.0), duration=11,
        speed=2.0, dist=20.0, fix_dist=10.0, fix_speed=10.0,
        fix_motion_duration=0.4, fix_duration=0.44, num_pts=5,
        category="METEOR", pt1=[10, 10], pt2=[30, 25], drct_loss=0.05,
        score=0.9, real_dist=40.0, center_point_list=[[20, 17]])


def test_exporter_bursty_flags_and_rescale():
    recheck = RecheckCfg(switch=False, model=ModelCfg(
        name="YOLOModel", weight_path="x.npz", dtype="bfloat16", nms=True,
        warmup=False, pos_thre=0.25, nms_thre=0.45, multiscale_pred=0,
        multiscale_partition=2))
    exp = MetExporter(recheck, _rt(), video_loader=None, logger=BaseMetLog(),
                      max_interval=100.0, det_thre=0.5)
    # bursts of active and drop batches from two threads
    def feed(offset):
        for i in range(50):
            exp.export(MetExporter.ACTIVE_FLAG, [_target(offset + i * 200)])
            exp.export(MetExporter.DROP_FLAG, [_target(offset + i * 200
                                                       + 100)])
    t1 = threading.Thread(target=feed, args=(0,))
    t2 = threading.Thread(target=feed, args=(1_000_000,))
    t1.start(); t2.start(); t1.join(); t2.join()
    exp.export(MetExporter.END_FLAG, [])
    exp.join()
    assert len(exp.meteor_list) == 200
    # rescale back to raw size (2x) happened exactly once per record
    for rec in exp.meteor_list:
        for t in rec.target:
            assert t.pt1[0] in (20, 60) and t.pt1[1] in (20, 50)


def test_native_assemble_concurrent_blocks():
    """Two threads driving the GIL-free native assembly into disjoint
    blocks must not interfere (the decode thread and e.g. a recheck
    loader can both be inside the C call at once)."""
    import numpy as np
    from metdetpy_tpu.native import resize_bgr2gray_assemble_u8
    rng = np.random.default_rng(7)
    frames = [np.ascontiguousarray(
        rng.integers(0, 255, (64, 96, 3), np.uint8)) for _ in range(32)]
    blocks = [np.zeros((16, 32, 48), np.uint8) for _ in range(2)]
    expected = [np.zeros_like(b) for b in blocks]
    for b, exp in zip(range(2), expected):
        import cv2
        for i, f in enumerate(frames[b * 16:(b + 1) * 16]):
            small = cv2.resize(f, (48, 32), interpolation=cv2.INTER_LINEAR)
            exp[i] = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)

    def run(b):
        resize_bgr2gray_assemble_u8(
            frames[b * 16:(b + 1) * 16], blocks[b], 0, 1,
            color_scratch=np.zeros((32, 48, 3), np.uint8))

    threads = [threading.Thread(target=run, args=(b,)) for b in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for b in range(2):
        np.testing.assert_array_equal(blocks[b], expected[b])


def test_loader_get_timeout_returns_none():
    """pop_block on a stalled/finished stream returns None instead of
    hanging (failure-detection semantics)."""
    from metdetpy_tpu.io.videoloader import BlockVideoLoader
    from metdetpy_tpu.io.videowrapper import NumpyVideoWrapper
    frames = np.zeros((8, 16, 16), np.uint8)
    loader = BlockVideoLoader(NumpyVideoWrapper, frames,
                              exp_option="real-time", merge_func="max",
                              grayscale=True, block_frames=8)
    loader.start()
    assert loader.pop_block() is not None
    assert loader.pop_block() is None  # end-of-stream sentinel
