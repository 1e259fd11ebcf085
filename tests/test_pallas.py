"""Pallas fused kernel vs the XLA/cv2 reference path (interpret mode on
CPU)."""

import cv2
import numpy as np
import pytest

from metdetpy_tpu.ops import filters, pallas_kernels


def _reference(diff, thr):
    out = []
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    for t in range(diff.shape[0]):
        med = cv2.medianBlur(diff[t], 3)
        _, binary = cv2.threshold(med, int(thr[t]), 255, cv2.THRESH_BINARY)
        out.append(cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel))
    return np.stack(out)


def test_fused_kernel_interpret_matches_cv2(rng, monkeypatch):
    import jax
    from jax.experimental import pallas as pl
    diff = rng.integers(0, 40, size=(3, 130, 64), dtype=np.uint8)
    thr = np.array([5, 9, 15], dtype=np.uint8)
    ref = _reference(diff, thr)

    # run the pallas kernel in interpreter mode (CPU test environment)
    import jax.numpy as jnp
    t, h, w = diff.shape
    got = pl.pallas_call(
        pallas_kernels._kernel,
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.uint8),
        grid=(t,),
        in_specs=[
            pl.BlockSpec(),  # whole [T,1] thr array
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        interpret=True,
    )(jnp.asarray(thr.reshape(t, 1), jnp.int32), jnp.asarray(diff))
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fallback_path_matches_cv2(rng, monkeypatch):
    monkeypatch.setenv("METDETPY_TPU_USE_PALLAS", "0")
    diff = rng.integers(0, 40, size=(2, 33, 47), dtype=np.uint8)
    thr = np.array([6, 12], dtype=np.uint8)
    import jax.numpy as jnp
    got = pallas_kernels.fused_median_binarize_close(jnp.asarray(diff),
                                                     jnp.asarray(thr))
    np.testing.assert_array_equal(np.asarray(got), _reference(diff, thr))


def _window_diff_ref(history, frames, n, timer0):
    from metdetpy_tpu.ops import windows
    import jax.numpy as jnp
    stats, new_hist = windows.window_stats(
        jnp.asarray(history), jnp.asarray(frames), n, jnp.int32(timer0))
    return np.asarray(stats.diff), np.asarray(new_hist)


@pytest.mark.parametrize("variant", ["vanherk", "stream"])
@pytest.mark.parametrize("n,t_block,timer0,h", [
    (5, 8, 0, 13),      # warmup from stream start, padded band
    (5, 8, 40, 16),     # steady state
    (7, 3, 2, 8),       # mid-warmup, T < n
    (2, 6, 0, 9),       # minimal window
    (5, 12, 0, 8),      # t_block > 2 segments (stream kernel's seg loop)
])
def test_window_diff_pallas_interpret_matches_xla(rng, n, t_block, timer0, h,
                                                  variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from metdetpy_tpu.ops import pallas_kernels as pk

    w = 256
    history = rng.integers(0, 256, (n - 1, h, w), dtype=np.uint8)
    if timer0 == 0:
        history[:] = 0  # stream start: zero-initialized ring
    frames = rng.integers(0, 256, (t_block, h, w), dtype=np.uint8)
    ref_diff, ref_hist = _window_diff_ref(history, frames, n, timer0)

    seq = jnp.concatenate([jnp.asarray(history), jnp.asarray(frames)], 0)
    timers = timer0 + 1 + jnp.arange(t_block, dtype=jnp.int32)
    lengths = jnp.minimum(timers, n)
    n_total = t_block + n - 1
    s_rows = 8
    h_pad = ((h + s_rows - 1) // s_rows) * s_rows
    if h_pad != h:
        seq = jnp.pad(seq, ((0, 0), (0, h_pad - h), (0, 0)))
    import functools
    kern = (pk._wd_kernel_stream if variant == "stream"
            else pk._wd_kernel)
    got = pl.pallas_call(
        functools.partial(kern, n=n, t_block=t_block),
        out_shape=jax.ShapeDtypeStruct((t_block, h_pad, w), jnp.uint8),
        grid=(h_pad // s_rows,),
        in_specs=[
            pl.BlockSpec(),
            pl.BlockSpec((n_total, s_rows, w), lambda b: (0, b, 0)),
        ],
        out_specs=pl.BlockSpec((t_block, s_rows, w), lambda b: (0, b, 0)),
        interpret=True,
    )(lengths.reshape(t_block, 1), seq)[:, :h, :]
    np.testing.assert_array_equal(np.asarray(got), ref_diff)


def test_window_diff_fallback_matches_window_stats(rng, monkeypatch):
    monkeypatch.setenv("METDETPY_TPU_USE_PALLAS", "0")
    import jax.numpy as jnp
    from metdetpy_tpu.ops import pallas_kernels as pk
    n, t_block, h, w = 6, 9, 17, 64
    history = rng.integers(0, 256, (n - 1, h, w), dtype=np.uint8)
    frames = rng.integers(0, 256, (t_block, h, w), dtype=np.uint8)
    ref_diff, ref_hist = _window_diff_ref(history, frames, n, 30)
    diff, hist = pk.window_diff(jnp.asarray(history), jnp.asarray(frames),
                                n, jnp.int32(30))
    np.testing.assert_array_equal(np.asarray(diff), ref_diff)
    np.testing.assert_array_equal(np.asarray(hist), ref_hist)


def test_hough_vote_pallas_interpret_matches_xla(rng):
    """The VMEM-resident vote kernel is bit-equal to the XLA hi/lo
    one-hot path for random compacted point lists (incl. invalid tail)."""
    import jax
    import jax.numpy as jnp
    from metdetpy_tpu.ops import hough
    from metdetpy_tpu.ops import pallas_kernels as pk

    h, w = 96, 160
    n_rho = hough._round_up(2 * (w + h) + 1, 128)
    rho_offset = w + h
    t, n = 3, 256
    xs = rng.integers(0, w, (t, n)).astype(np.float32)
    ys = rng.integers(0, h, (t, n)).astype(np.float32)
    counts = [n, n // 3, 0]  # full, partial, empty point lists
    valid = np.zeros((t, n), bool)
    for i, c in enumerate(counts):
        valid[i, :c] = True

    ref = jax.vmap(lambda x_, y_, v_: hough._vote(
        x_, y_, v_, 180, n_rho, rho_offset, 30))(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid))
    got = pk.hough_vote_pallas(jnp.asarray(xs), jnp.asarray(ys),
                               jnp.asarray(valid), n_rho, rho_offset,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # sanity: each frame's total votes == 180 * n_valid_points
    tot = np.asarray(got).sum(axis=(1, 2))
    np.testing.assert_array_equal(tot, [180 * c for c in counts])


def test_vote_theta_chunk_scales_with_point_budget():
    """The per-program theta chunk must shrink as the point capacity
    grows (the [128, N] one-hot liveness is ~N/4 KB per unrolled theta;
    ClassicDetector's 4x budget needs chunk 1) and always divide 180."""
    from metdetpy_tpu.ops.pallas_kernels import _vote_theta_chunk
    assert _vote_theta_chunk(1024) == 4
    assert _vote_theta_chunk(8192) == 4
    assert _vote_theta_chunk(16384) == 2
    assert _vote_theta_chunk(32768) == 1
    for n in (256, 8192, 16384, 32768):
        assert 180 % _vote_theta_chunk(n) == 0


def test_walk_pick_pallas_interpret_matches_onehot(rng):
    """The banded VMEM-resident walk pick equals hough._picks_onehot on
    every column the walk keeps (line-shaped row maps with |dr| <= 1 per
    column like the real geometry, out-of-plane excursions masked by
    inp, mixed plane selectors). Invalid columns are masked downstream
    in both forms, so equality is asserted on v * inp."""
    import jax
    import jax.numpy as jnp
    from metdetpy_tpu.ops import hough
    from metdetpy_tpu.ops import pallas_kernels as pk

    t, k, s = 3, 16, 384  # s > WALK_ROW_BAND exercises banding; k = 2 groups
    planes = rng.integers(0, 16, (t, 2, s, s), dtype=np.uint8)
    # line-shaped rows: r(c) = r_start + slope * c (|slope| <= 1), some
    # running off the plane
    cols = np.arange(s, dtype=np.float32)
    r = np.zeros((t, k, s), np.int32)
    inp = np.zeros((t, k, s), bool)
    for ti in range(t):
        for ki in range(k):
            slope = rng.uniform(-1, 1)
            r_start = rng.integers(-40, s + 40)
            rr = np.floor(r_start + slope * cols).astype(np.int32)
            r[ti, ki] = rr
            lo, hi = sorted(rng.choice(s, 2, replace=False))
            inp[ti, ki, lo:hi + 1] = (rr[lo:hi + 1] >= 0) \
                & (rr[lo:hi + 1] < s)
    xmaj = rng.integers(0, 2, (t, k)).astype(bool)
    r0 = jax.vmap(lambda r_, ip: pk._pick_row_bands(r_, ip, s))(
        jnp.asarray(r), jnp.asarray(inp))
    got = pk.walk_pick_pallas(jnp.asarray(planes), jnp.asarray(r),
                              jnp.asarray(xmaj), r0, interpret=True)
    want = jax.vmap(hough._picks_onehot)(jnp.asarray(planes),
                                         jnp.asarray(r), jnp.asarray(xmaj))
    np.testing.assert_array_equal(np.asarray(got) * inp,
                                  np.asarray(want) * inp)

    # K not a multiple of WALK_PEAK_GROUP pads internally instead of
    # asserting (ADVICE r4): same inputs truncated to K=11
    k_odd = 11
    got_odd = pk.walk_pick_pallas(
        jnp.asarray(planes), jnp.asarray(r[:, :k_odd]),
        jnp.asarray(xmaj[:, :k_odd]), r0[:, :k_odd], interpret=True)
    assert got_odd.shape == (t, k_odd, s)
    np.testing.assert_array_equal(
        np.asarray(got_odd) * inp[:, :k_odd],
        np.asarray(want)[:, :k_odd] * inp[:, :k_odd])
