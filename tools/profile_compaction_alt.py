"""A/B gather-free alternatives for _compact_indices on the dense case.

 A: current (mask compare-count + u8 row gather + tri-matmul prefix)
 B: lax.top_k over position scores (one fused op, no gather)
 C: one-hot row-select MATMUL replacing the row gather (rowsel @ (x2@tri))

All three must return identical (idx, valid); equality is asserted on
the first block before timing.

Usage: python tools/profile_compaction_alt.py [k]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _chained_slope
    from metdetpy_tpu.ops.hough import _compact_indices, _round_up

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    h, w = 540, 960
    bf = 64
    rng = np.random.default_rng(7)
    imgs = np.zeros((bf, h, w), np.uint8)
    ys = rng.integers(1, h - 1, (bf, 680))
    xs = rng.integers(1, w - 1, (bf, 680))
    for t in range(bf):
        for y, x_ in zip(ys[t], xs[t]):
            imgs[t, y - 1:y + 2, x_ - 1:x_ + 2] = 1
    flat = imgs.reshape(bf, -1)
    print("npix/frame ~", int(flat.sum(1).mean()))
    n = flat.shape[1]
    flat_dev = jax.device_put(flat)
    jax.block_until_ready(flat_dev)

    @jax.jit
    def variant_a(flats):
        return jax.vmap(lambda f: _compact_indices(f, k))(flats)

    @jax.jit
    def variant_b(flats):
        def one(f):
            # active position p scores n - p (positive, descending in p);
            # inactive scores 0 -> top_k returns actives in ascending-p
            # order, then zeros
            score = f.astype(jnp.int32) * (n - jnp.arange(n, dtype=jnp.int32))
            vals, _ = lax.top_k(score, k)
            valid = vals > 0
            idx = n - vals
            return jnp.where(valid, idx, -1), valid
        return jax.vmap(one)(flats)

    @jax.jit
    def variant_c(flats):
        row = 512
        n_pad = _round_up(n, row)
        targets = jnp.arange(1, k + 1, dtype=jnp.int32)
        tri = jnp.triu(jnp.ones((row, row), jnp.bfloat16))

        def one(f):
            x = jnp.pad(f, (0, n_pad - n)) if n_pad != n else f
            x2 = x.reshape(-1, row)
            r_dim = x2.shape[0]
            row_tot = jnp.sum(x2, axis=1, dtype=jnp.int32)
            rp = jnp.cumsum(row_tot)
            total = rp[-1]
            mask = rp[None, :] < targets[:, None]
            row_idx = jnp.sum(mask, axis=1).astype(jnp.int32)
            base = jnp.sum(mask * row_tot[None, :], axis=1).astype(jnp.int32)
            row_idx = jnp.clip(row_idx, 0, r_dim - 1)
            local_target = targets - base
            # within-row inclusive prefix for ALL rows: one MXU matmul
            w_all = lax.dot_general(x2.astype(jnp.bfloat16), tri,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # one-hot row select as a second MXU matmul (no gather)
            rowsel = (row_idx[:, None]
                      == jnp.arange(r_dim)[None, :]).astype(jnp.bfloat16)
            rows_within = lax.dot_general(rowsel, w_all,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            col_idx = jnp.sum(
                rows_within < local_target.astype(jnp.float32)[:, None],
                axis=1).astype(jnp.int32)
            idx = row_idx * row + jnp.clip(col_idx, 0, row - 1)
            valid = targets <= total
            return jnp.where(valid, idx, -1), valid
        return jax.vmap(one)(flats)

    ia, va = jax.device_get(variant_a(flat_dev))
    for name, fn in (("top_k", variant_b), ("rowsel-matmul", variant_c)):
        i2, v2 = jax.device_get(fn(flat_dev))
        same = bool((va == v2).all() and (ia[va] == i2[v2]).all())
        print(f"{name}: equal_to_current={same}")
        assert same, name

    def timer(fn):
        def run(n_steps):
            t0 = time.time()
            out = None
            for _ in range(n_steps):
                out = fn(flat_dev)
            float(np.asarray(out[0][0, 0]))
            return time.time() - t0
        return run

    for name, fn in (("A current", variant_a), ("B top_k", variant_b),
                     ("C rowsel-matmul", variant_c)):
        slope_s, _ = _chained_slope(timer(fn), counts=(8, 72))
        print(f"{name:18s} {slope_s * 1e3:7.3f} ms/block")


if __name__ == "__main__":
    main()
