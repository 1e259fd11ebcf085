"""Split the dense worst-case block step into chain-only vs hough-only.

The worst-case bench (bench.bench_device_worstcase) times the FULL fused
M3 step on clustered-salt blocks. Isolated sub-op timings are unreliable
under tunnel jitter, but FULL-program chained slopes are stable -- so
this tool compiles two full programs and subtracts:

  - chain-only: window_diff + sub-ROI noise std + EMA scan + fused
    median/binarize/close + dynamic mask + dst_sum (everything in
    detectors.m3det._m3_block_step EXCEPT hough_lines_batch)
  - full step: the real _m3_block_step (what the bench times)

Usage: python tools/profile_worstcase_split.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def make_dense_frames(n_blocks: int = 4, block_frames: int = 64,
                      h: int = 540, w: int = 960) -> np.ndarray:
    """Same clustered-salt construction as bench.bench_device_worstcase."""
    rng = np.random.default_rng(7)
    frames = rng.normal(16, 4, (n_blocks * block_frames, h, w))
    frames = frames.clip(0, 255).astype(np.uint8)
    ys = rng.integers(1, h - 1, (frames.shape[0], 48))
    xs = rng.integers(1, w - 1, (frames.shape[0], 48))
    for t in range(frames.shape[0]):
        for y, x in zip(ys[t], xs[t]):
            frames[t, y - 1:y + 2, x - 1:x + 2] = 255
    return frames


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from bench import _chained_slope
    from metdetpy_tpu.detectors.m3det import (M3Detector,
                                              _ema_threshold_scan)
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.ops import filters, windows
    from metdetpy_tpu.ops.pallas_kernels import (fused_median_binarize_close,
                                                 window_diff)
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import get_num_class, relative2abs_path

    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    cfg.detector.cfg.binary.adaptive_bi_thre = False
    cfg.detector.cfg.binary.init_value = 30
    h, w = 540, 960
    bf = 64
    frames = make_dense_frames(4, bf, h, w)

    det = M3Detector(window_sec=cfg.detector.window_sec, fps=25.0,
                     mask=np.ones((h, w), np.uint8), num_cls=get_num_class(),
                     cfg=cfg.detector.cfg, logger=BaseMetLog())
    blocks = [jax.device_put(frames[i * bf:(i + 1) * bf]) for i in range(4)]
    jax.block_until_ready(blocks)

    kw = det._step_static_kwargs()
    n = kw["n"]
    roi = kw["roi"]
    r1, c1, r2, c2 = roi

    @functools.partial(jax.jit, static_argnames=())
    def chain_only(gray_hist, sub_hist, dy_hist, ema_state, frames_, timer0):
        diff, new_gray = window_diff(gray_hist, frames_, n, timer0)
        stds, new_sub = windows.window_noise_std(
            sub_hist, frames_[:, r1:r2, c1:c2], n, timer0)
        thr, thr_f, ema_vals, new_ema = _ema_threshold_scan(
            stds, timer0, ema_state, n=n, std_interval=kw["std_interval"],
            momentum=kw["momentum"], warmup_speed=kw["warmup_speed"],
            adaptive=kw["adaptive"], coef_a=kw["coef_a"],
            coef_b=kw["coef_b"])
        closed = fused_median_binarize_close(diff, thr)
        new_dy = dy_hist
        dst = closed
        if kw["dy_mask"]:
            dy_sum, new_dy = windows.rolling_sum_u32(dy_hist, closed, n)
            t_block = closed.shape[0]
            timers = timer0 + 1 + jnp.arange(t_block, dtype=jnp.int32)
            lens = jnp.minimum(timers, n).astype(jnp.uint32)[:, None, None]
            passmask = (dy_sum <= (lens - 1) * 255).astype(jnp.uint8)
            passmask = filters.erode3x3(passmask)
            dst = closed * passmask
        dst_sum = (jnp.sum(dst.astype(jnp.uint32), axis=(1, 2)) / 255.0
                   / kw["mask_area"] * 100.0)
        new_timer = timer0 + jnp.int32(frames_.shape[0])
        return (dst_sum, dst, new_gray, new_sub, new_dy, new_ema,
                new_timer)

    def run_chain(n_steps):
        gray = jnp.zeros((n - 1, h, w), jnp.uint8)
        sub = jnp.zeros((n - 1, r2 - r1, c2 - c1), jnp.uint8)
        dy = jnp.zeros((n - 1, h, w), jnp.uint8)
        ema = det._ema
        timer = jnp.zeros((), jnp.int32)
        t0 = time.time()
        out = None
        for i in range(n_steps):
            out, _dst, gray, sub, dy, ema, timer = chain_only(
                gray, sub, dy, ema, blocks[i % 4], timer)
        float(out[0])
        return time.time() - t0

    def run_full(n_steps):
        det.reset_device_state()
        t0 = time.time()
        packed = None
        for i in range(n_steps):
            packed, _dst = det.process_block_async(blocks[i % 4])
        float(packed[0, 0])
        return time.time() - t0

    for name, fn in (("chain-only (no hough)", run_chain),
                     ("FULL dense step", run_full)):
        slope_s, _ = _chained_slope(fn, counts=(16, 128))
        print(f"{name:24s} {slope_s * 1e3:7.3f} ms/block "
              f"({64 / slope_s:.0f} fps)")


if __name__ == "__main__":
    main()
