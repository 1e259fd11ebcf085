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


def test_native_ring_multi_producer():
    from metdetpy_tpu.native import FrameRing
    ring = FrameRing(8, (8, 8))
    n_per = 40
    def produce(val):
        for _ in range(n_per):
            assert ring.put(np.full((8, 8), val, np.uint8), timeout=5.0)
    threads = [threading.Thread(target=produce, args=(v,)) for v in (1, 2)]
    got = []
    def consume():
        while len(got) < 2 * n_per:
            f = ring.get(timeout=5.0)
            if f is None:
                break
            got.append(int(f[0, 0]))
    tc = threading.Thread(target=consume)
    tc.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    tc.join(timeout=10)
    assert len(got) == 2 * n_per
    assert sorted(set(got)) == [1, 2]


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
