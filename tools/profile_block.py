"""Sub-op profile of the fused M3 block step on the attached device.

Slope-times (see bench._chained_slope) the full quiet-sky block step and
each of its device sub-stages independently, so kernel-fusion targets are
ranked by measured cost rather than guessed (VERDICT r3 weak #7 tracked
window stats at 3.9 ms of an 8.48 ms quiet block from such a profile).

Usage:  python tools/profile_block.py [H W T]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bench import _chained_slope
    from metdetpy_tpu.detectors.m3det import M3Detector
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.ops import windows
    from metdetpy_tpu.ops.pallas_kernels import (fused_median_binarize_close,
                                                 window_diff)
    from metdetpy_tpu.structs import MainDetectCfg
    from metdetpy_tpu.utils import get_num_class, relative2abs_path

    h, w, t = (int(x) for x in (sys.argv[1:4] or (540, 960, 64)))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 24, (t * 5, h, w), np.uint8)  # quiet noise
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    det = M3Detector(window_sec=cfg.detector.window_sec, fps=25.0,
                     mask=np.ones((h, w), np.uint8),
                     num_cls=get_num_class(), cfg=cfg.detector.cfg,
                     logger=BaseMetLog())
    n = det.n
    blocks = [jax.device_put(frames[i * t:(i + 1) * t]) for i in range(5)]
    hist = jax.device_put(np.zeros((n - 1, h, w), np.uint8))
    dyh = jax.device_put(np.zeros((n - 1, h, w), np.uint8))
    timer0 = jnp.int32(10 * n)  # steady state: warmup lengths saturated
    jax.block_until_ready((blocks, hist, dyh))

    def slope_of(step, label, scale=1.0):
        def run_n(k):
            t0 = time.time()
            out = step(k)
            jax.block_until_ready(out)
            # force a real d2h fetch off the chain tail
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf)).ravel()[:1]
            return time.time() - t0
        run_n(2)
        s, _ = _chained_slope(run_n, counts=(8, 72), reps=3)
        print(f"{label:32s} {s * 1e3 / scale:8.3f} ms/block")
        return s

    # full fused step (async handle -> packed readback forced by caller)
    def full_step(k):
        packed = None
        for i in range(k):
            packed, _ = det.process_block_async(blocks[i % 5])
        return packed
    total = slope_of(full_step, "FULL quiet block step")

    # window diff (Pallas van Herk or XLA fallback -- whatever is active)
    def wd(k):
        hh, out = hist, None
        for i in range(k):
            out, hh = window_diff(hh, blocks[i % 5], n, timer0)
        return out
    t_wd = slope_of(wd, "window_diff (max/mean/diff)")

    # fused median/binarize/close on a plausible diff input
    diff0 = jax.block_until_ready(wd(1))
    thr = jnp.full((t,), 7, jnp.int32)

    def med(k):
        out = diff0
        for _ in range(k):
            out = fused_median_binarize_close(out, thr)
        return out
    t_med = slope_of(med, "fused median/binarize/close")

    # dy-mask rolling sum (the remaining reduce_window user)
    closed0 = jax.block_until_ready(med(1))

    def dy(k):
        hh, out = dyh, None
        for _ in range(k):
            out, hh = windows.rolling_sum_u32(hh, closed0, n)
        return out
    t_dy = slope_of(dy, "dy rolling_sum_u32")

    # sub-ROI noise std
    r1, c1, r2, c2 = det.std_roi
    sub_hist = jax.device_put(np.zeros((n - 1, r2 - r1, c2 - c1), np.uint8))

    def std(k):
        hh, out = sub_hist, None
        for i in range(k):
            out, hh = windows.window_noise_std(
                hh, blocks[i % 5][:, r1:r2, c1:c2], n, timer0)
        return out
    t_std = slope_of(std, "window_noise_std (sub-ROI)")

    rest = total - t_wd - t_med - t_dy - t_std
    print(f"{'rest (hough+EMA+pack+dispatch)':32s} {rest * 1e3:8.3f} ms/block")
    print(f"quiet-block fps: {t / total:.0f}  (n_window={n}, {h}x{w}x{t})")


if __name__ == "__main__":
    main()
