"""Stage-bisect _compact_indices on the dense worst-case distribution.

Builds three cumulative jits (mask compare-count; + u8 row gather; + tri
matmul within-row prefix) over the same [64, H*W] dense input and
slope-times each, so the difference isolates each stage's real cost.

Usage: python tools/profile_compaction.py [k]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from tools.profile_worstcase_split import make_dense_frames  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _chained_slope
    from metdetpy_tpu.ops.hough import _round_up

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    h, w = 540, 960
    bf = 64
    # ~680 3x3 blobs/frame ~= 6.1k active px: the worst-case bench's
    # steady-state binarized density (profile_dense uses the same)
    rng = np.random.default_rng(7)
    imgs = np.zeros((bf, h, w), np.uint8)
    ys = rng.integers(1, h - 1, (bf, 680))
    xs = rng.integers(1, w - 1, (bf, 680))
    for t in range(bf):
        for y, x_ in zip(ys[t], xs[t]):
            imgs[t, y - 1:y + 2, x_ - 1:x_ + 2] = 1
    dst01 = imgs.reshape(bf, -1)
    print("npix/frame ~", int(dst01.sum(1).mean()))

    row = 512
    n = dst01.shape[1]
    n_pad = _round_up(n, row)
    x = np.pad(dst01, ((0, 0), (0, n_pad - n)))
    x2_host = x.reshape(bf, -1, row)
    x2 = jax.device_put(x2_host)
    jax.block_until_ready(x2)

    targets = jnp.arange(1, k + 1, dtype=jnp.int32)

    @jax.jit
    def stage_mask(x2_):
        def one(xf):
            row_tot = jnp.sum(xf, axis=1, dtype=jnp.int32)
            rp = jnp.cumsum(row_tot)
            mask = rp[None, :] < targets[:, None]
            row_idx = jnp.sum(mask, axis=1).astype(jnp.int32)
            base = jnp.sum(mask * row_tot[None, :], axis=1).astype(jnp.int32)
            return row_idx, base
        return jax.vmap(one)(x2_)

    @jax.jit
    def stage_gather(x2_):
        def one(xf):
            row_tot = jnp.sum(xf, axis=1, dtype=jnp.int32)
            rp = jnp.cumsum(row_tot)
            mask = rp[None, :] < targets[:, None]
            row_idx = jnp.sum(mask, axis=1).astype(jnp.int32)
            base = jnp.sum(mask * row_tot[None, :], axis=1).astype(jnp.int32)
            row_idx = jnp.clip(row_idx, 0, xf.shape[0] - 1)
            rows8 = jnp.take(xf, row_idx, axis=0)
            return row_idx, base, jnp.sum(rows8, dtype=jnp.int32)
        return jax.vmap(one)(x2_)

    @jax.jit
    def stage_full(x2_):
        def one(xf):
            row_tot = jnp.sum(xf, axis=1, dtype=jnp.int32)
            rp = jnp.cumsum(row_tot)
            mask = rp[None, :] < targets[:, None]
            row_idx = jnp.sum(mask, axis=1).astype(jnp.int32)
            base = jnp.sum(mask * row_tot[None, :], axis=1).astype(jnp.int32)
            row_idx = jnp.clip(row_idx, 0, xf.shape[0] - 1)
            local_target = targets - base
            rows8 = jnp.take(xf, row_idx, axis=0)
            tri = jnp.triu(jnp.ones((row, row), jnp.bfloat16))
            row_within = lax.dot_general(
                rows8.astype(jnp.bfloat16), tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            col_idx = jnp.sum(
                row_within < local_target.astype(jnp.float32)[:, None],
                axis=1).astype(jnp.int32)
            idx = row_idx * row + jnp.clip(col_idx, 0, row - 1)
            return idx
        return jax.vmap(one)(x2_)

    def timer(fn, extract):
        def run(n_steps):
            t0 = time.time()
            out = None
            for _ in range(n_steps):
                out = fn(x2)
            float(np.asarray(extract(out)).ravel()[0])
            return time.time() - t0
        return run

    for name, fn, ex in (
            ("mask compare-count", stage_mask, lambda o: o[0][0, 0]),
            ("+ u8 row gather", stage_gather, lambda o: o[2][0]),
            ("+ tri-matmul prefix", stage_full, lambda o: o[0, 0])):
        slope_s, _ = _chained_slope(timer(fn, ex), counts=(8, 72))
        print(f"{name:22s} {slope_s * 1e3:7.3f} ms/block")


if __name__ == "__main__":
    main()
