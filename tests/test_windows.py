"""Window statistics vs a direct numpy oracle replicating the reference
SlidingWindow semantics (ring buffer with zero init, integer mean)."""

import numpy as np

from metdetpy_tpu.ops import windows


def _oracle_sliding(frames, n):
    """Reference-semantics oracle: zero-initialized ring, sum//length mean."""
    h, w = frames.shape[1:]
    ring = np.zeros((n, h, w), dtype=np.uint8)
    s = np.zeros((h, w), dtype=np.uint32)
    maxes, means = [], []
    for t, f in enumerate(frames):
        timer = t + 1
        cur = (timer - 1) % n
        if timer > n:
            s -= ring[cur]
        ring[cur] = f
        s += f
        length = min(n, timer)
        maxes.append(ring.max(axis=0))
        means.append((s // length).astype(np.uint8))
    return np.stack(maxes), np.stack(means)


def test_window_stats_matches_oracle(rng):
    n, t_total = 5, 23
    frames = rng.integers(0, 256, size=(t_total, 9, 11), dtype=np.uint8)
    ref_max, ref_mean = _oracle_sliding(frames, n)

    # feed in blocks of 7 with carried history
    hist = np.zeros((n - 1, 9, 11), dtype=np.uint8)
    got_max, got_mean = [], []
    timer0 = 0
    for blk in range(0, t_total, 7):
        chunk = frames[blk:blk + 7]
        stats, hist = windows.window_stats(hist, chunk, n,
                                           np.int32(timer0))
        got_max.append(np.asarray(stats.win_max))
        got_mean.append(np.asarray(stats.win_mean))
        timer0 += len(chunk)
    got_max = np.concatenate(got_max)
    got_mean = np.concatenate(got_mean)

    # warmup caveat: during the first n-1 frames the oracle max is over
    # `timer` frames plus implicit ring zeros -- identical to our zero
    # history, so exact match everywhere including warmup.
    np.testing.assert_array_equal(got_max, ref_max)
    np.testing.assert_array_equal(got_mean, ref_mean)
    np.testing.assert_array_equal(
        np.asarray(stats.diff), got_max[-len(chunk):] - got_mean[-len(chunk):])


def test_window_noise_std_matches_oracle(rng):
    n, t_total = 4, 14
    frames = rng.integers(0, 256, size=(t_total, 6, 7), dtype=np.uint8)

    # oracle: np.std(window - int_mean) exactly as SNR_SW computes it
    ring = np.zeros((n, 6, 7), dtype=np.uint8)
    s = np.zeros((6, 7), dtype=np.uint32)
    ref = []
    for t, f in enumerate(frames):
        timer = t + 1
        cur = (timer - 1) % n
        if timer > n:
            s -= ring[cur]
        ring[cur] = f
        s += f
        length = min(n, timer)
        mean = (s // length).astype(np.uint8).astype(float)
        win = ring if timer >= n else ring[:timer]
        ref.append(np.std(win - mean))

    hist = np.zeros((n - 1, 6, 7), dtype=np.uint8)
    stds, _ = windows.window_noise_std(hist, frames, n, np.int32(0))
    # device computes in f32; the float64 oracle differs at ~3e-5 relative
    np.testing.assert_allclose(np.asarray(stds), np.array(ref), rtol=2e-4)


def test_merge_exposure_max(rng):
    frames = rng.integers(0, 256, size=(12, 5, 5), dtype=np.uint8)
    merged = np.asarray(windows.merge_exposure_max(frames, 3))
    assert merged.shape == (4, 5, 5)
    np.testing.assert_array_equal(merged[0], frames[:3].max(axis=0))


def test_rolling_sum_u32(rng):
    n = 3
    frames = (rng.integers(0, 2, size=(10, 4, 4), dtype=np.uint8)) * 255
    hist = np.zeros((n - 1, 4, 4), dtype=np.uint8)
    s, _ = windows.rolling_sum_u32(hist, frames, n)
    padded = np.concatenate([hist, frames]).astype(np.uint32)
    for t in range(10):
        np.testing.assert_array_equal(np.asarray(s[t]),
                                      padded[t:t + n].sum(axis=0))
