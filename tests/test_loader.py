"""Loader tests: exposure-time estimation on slow-shutter video, exposure
merging, block assembly, and recheck color stacks."""

import numpy as np

from metdetpy_tpu.io.videoloader import (BlockVideoLoader, ThreadVideoLoader,
                                         VanillaVideoLoader, rf_estimator)
from metdetpy_tpu.io.videowrapper import NumpyVideoWrapper


def _slow_shutter_video(n_exposures=60, exp_frames=3, h=32, w=48, seed=5):
    """Each exposure is held for exp_frames frames (plus tiny sensor noise
    per readout -- the slow-shutter pattern rf_estimator detects via
    frame-sum curvature)."""
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n_exposures):
        img = rng.integers(20, 200, (h, w)).astype(np.int16)
        for _ in range(exp_frames):
            frames.append(np.clip(img + rng.normal(0, 2, img.shape), 0,
                                  255).astype(np.uint8))
    return np.stack(frames)


def test_rf_estimator_detects_exposure_interval():
    frames = _slow_shutter_video(exp_frames=3)
    loader = VanillaVideoLoader(NumpyVideoWrapper, frames,
                                exp_option="real-time",
                                merge_func="max", grayscale=True)
    est = rf_estimator(loader)
    assert est == 3, est


def test_auto_exposure_sets_exp_frame():
    frames = _slow_shutter_video(exp_frames=4, n_exposures=50)
    loader = VanillaVideoLoader(NumpyVideoWrapper, frames, exp_option="auto",
                                exp_upper_bound=0.5, merge_func="max",
                                grayscale=True)
    # the reference estimator is deliberately conservative
    # (min(median, sigma-clipped mean)); sensor noise can split intervals,
    # so accept a one-frame underestimate
    assert 3 <= loader.exp_frame <= 5, loader.exp_frame


def test_block_loader_merges_exposures():
    frames = _slow_shutter_video(exp_frames=2, n_exposures=40)
    loader = BlockVideoLoader(NumpyVideoWrapper, frames, exp_option=2 / 25,
                              merge_func="max", grayscale=True,
                              block_frames=8)
    assert loader.exp_frame == 2
    loader.start()
    total = 0
    while True:
        blk = loader.pop_block()
        if blk is None:
            break
        assert blk.shape[1:] == frames.shape[1:]
        total += blk.shape[0]
    assert total == 40  # 80 raw frames -> 40 merged


def test_block_loader_color_stacks_cover_stream():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (48, 24, 32, 3), dtype=np.uint8)
    loader = BlockVideoLoader(NumpyVideoWrapper, frames,
                              exp_option="real-time", merge_func="max",
                              grayscale=True, keep_color_stacks=True,
                              block_frames=16)
    loader.start()
    while loader.pop_block() is not None:
        pass
    stack = loader.recheck_stack(0, 47)
    assert stack is not None and stack.shape == (24, 32, 3)
    # the stack is the max over covered chunks of *color* frames
    assert stack.max() >= frames.max() - 1


def test_thread_loader_pop_sequence():
    frames = np.arange(20, dtype=np.uint8)[:, None, None] * np.ones(
        (20, 8, 8), np.uint8)
    loader = ThreadVideoLoader(NumpyVideoWrapper, frames,
                               exp_option="real-time", merge_func="max",
                               grayscale=True)
    loader.start()
    seen = []
    for _ in range(loader.iterations):
        f = loader.pop()
        if f is None:
            break
        seen.append(int(f[0, 0]))
    assert seen == list(range(20))
