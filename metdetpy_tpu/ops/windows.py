"""Batched sliding-window statistics over frame blocks.

TPU-native replacement for the reference's per-frame ``SlidingWindow`` ring
buffer (reference MetLib/utils.py:225-321): instead of updating one frame at
a time in Python (with an O(n*H*W) np.max per frame -- the reference's #1
hot spot, see SURVEY.md §3.1), a whole block of T frames is processed at
once.  The window history (the previous n-1 frames) is carried between
blocks, and per-position max / sum / sum-of-squares come from a single
``lax.reduce_window`` over the time axis, which XLA maps to fused
VPU-friendly rolling reductions.

Warmup semantics match the reference exactly: during the first n-1 frames
the mean divides by the number of frames seen so far (``length = min(n,
timer)``, reference MetLib/utils.py:289-296) and the integer mean is
``sum // length`` in uint8.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class WindowStats(NamedTuple):
    """Per-frame-position window statistics for a block of T frames."""
    win_max: jax.Array   # [T, H, W] uint8: max over the trailing window
    win_mean: jax.Array  # [T, H, W] uint8: integer mean (sum // length)
    diff: jax.Array      # [T, H, W] uint8: win_max - win_mean (>= 0)


def _rolling(x: jax.Array, n: int, op, init) -> jax.Array:
    """Rolling reduce over axis 0 with window n, 'valid' extent.

    x: [n-1+T, ...] -> [T, ...]
    """
    dims = (n,) + (1,) * (x.ndim - 1)
    return lax.reduce_window(x, init, op, dims, (1,) * x.ndim,
                             [(0, 0)] * x.ndim)


@functools.partial(jax.jit, static_argnames=("n",))
def window_stats(history: jax.Array, frames: jax.Array, n: int,
                 timer0: jax.Array) -> tuple[WindowStats, jax.Array]:
    """Compute trailing-window max/mean for each frame position in a block.

    Args:
      history: [n-1, H, W] uint8 -- the n-1 frames preceding this block
        (zeros before the stream starts, matching the reference's
        zero-initialized ring buffer, MetLib/utils.py:263-265).
      frames: [T, H, W] uint8 block of new (already exposure-merged) frames.
      n: window size in merged frames (= window_sec * eq_fps).
      timer0: scalar int32, number of frames consumed before this block
        (the reference's ``timer`` minus T at block start).

    Returns:
      (WindowStats, new_history [n-1, H, W]).
    """
    t_block = frames.shape[0]
    seq = jnp.concatenate([history, frames], axis=0)  # [n-1+T, H, W]
    win_max = _rolling(seq, n, lax.max, jnp.uint8(0))
    win_sum = _rolling(seq.astype(jnp.uint32), n, lax.add, jnp.uint32(0))
    # length = min(n, timer) with timer = timer0 + t + 1 at position t
    timers = timer0 + 1 + jnp.arange(t_block, dtype=jnp.int32)
    lengths = jnp.minimum(timers, n).astype(jnp.uint32)[:, None, None]
    win_mean = (win_sum // lengths).astype(jnp.uint8)
    diff = win_max - win_mean  # max >= mean element-wise, no wraparound
    new_history = seq[t_block:] if n > 1 else history
    return WindowStats(win_max, win_mean, diff), new_history


@functools.partial(jax.jit, static_argnames=("n",))
def window_noise_std(history: jax.Array, frames: jax.Array, n: int,
                     timer0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-position std of the sub-ROI window around its integer mean.

    Replicates ``np.std(window - int_mean)`` over all window elements
    (reference SNR_SW.update, MetLib/Detector.py:81-91): with rolling sums
    S1 = sum(x), S2 = sum(x^2) and m = S1 // length, the per-pixel sum of
    squared deviations is S2 - 2*m*S1 + length*m^2; the std is the sqrt of
    its mean over pixels and window slots.

    Args:
      history: [n-1, h, w] uint8 sub-ROI history.
      frames: [T, h, w] uint8 sub-ROI block.
      n, timer0: as in :func:`window_stats`.

    Returns:
      (stds [T] float32, new_history).
    """
    t_block = frames.shape[0]
    seq = jnp.concatenate([history, frames], axis=0)
    s1 = _rolling(seq.astype(jnp.uint32), n, lax.add, jnp.uint32(0))
    s2 = _rolling(jnp.square(seq.astype(jnp.uint32)), n, lax.add,
                  jnp.uint32(0))
    timers = timer0 + 1 + jnp.arange(t_block, dtype=jnp.int32)
    lengths = jnp.minimum(timers, n).astype(jnp.float32)[:, None, None]
    m = jnp.floor(s1.astype(jnp.float32) / lengths)  # integer mean as float
    ssd = (s2.astype(jnp.float32) - 2.0 * m * s1.astype(jnp.float32)
           + lengths * jnp.square(m))
    var = jnp.sum(ssd, axis=(1, 2)) / (
        lengths[:, 0, 0] * frames.shape[1] * frames.shape[2])
    stds = jnp.sqrt(jnp.maximum(var, 0.0))
    new_history = seq[t_block:] if n > 1 else history
    return stds, new_history


@functools.partial(jax.jit, static_argnames=("n",))
def rolling_sum_u32(history: jax.Array, frames: jax.Array,
                    n: int) -> tuple[jax.Array, jax.Array]:
    """Rolling window sum (uint32) over a block, carrying history.

    Used for the dynamic-mask response window (reference
    MetLib/Detector.py:234-242).
    """
    t_block = frames.shape[0]
    seq = jnp.concatenate([history, frames], axis=0)
    s = _rolling(seq.astype(jnp.uint32), n, lax.add, jnp.uint32(0))
    new_history = seq[t_block:] if n > 1 else history
    return s, new_history


def merge_exposure_max(frames: jax.Array, exp_frame: int) -> jax.Array:
    """Merge consecutive exp_frame raw frames by per-pixel max.

    The TPU analog of MergeFunction.max applied in VideoLoader.pop
    (reference MetLib/videoloader.py:360-388): [T*e, H, W] -> [T, H, W].
    """
    if exp_frame == 1:
        return frames
    t, h, w = frames.shape
    assert t % exp_frame == 0, "frame count must be a multiple of exp_frame"
    return jnp.max(frames.reshape(t // exp_frame, exp_frame, h, w), axis=1)
