"""Sub-op profile of the DENSE Hough path (the worst-case bench's cost).

Slope-times hough_lines_batch on a clustered-salt dense block (the
bench_device_worstcase input distribution: npix just under max_points so
every chunk pays the full dense vote), then its stages in isolation:
compaction, the Pallas vote, peak-find, and the gather-free segment walk.

Usage: python tools/profile_dense.py [n_pts_per_frame]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metdetpy_tpu.ops import hough
    from metdetpy_tpu.ops.pallas_kernels import hough_vote_pallas

    t_block, h, w = 64, 540, 960
    n_blobs = int(sys.argv[1]) if len(sys.argv) > 1 else 680
    rng = np.random.default_rng(7)
    # ~9 px per 3x3 blob -> n_blobs*9 active px/frame (no rolling max here;
    # feed the binarized dst directly)
    dst = np.zeros((t_block, h, w), np.uint8)
    ys = rng.integers(1, h - 1, (t_block, n_blobs))
    xs = rng.integers(1, w - 1, (t_block, n_blobs))
    for t in range(t_block):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                dst[t, ys[t] + dy, xs[t] + dx] = 255
    npix = int((dst[0] > 0).sum())
    print(f"npix/frame ~ {npix}")
    dst_d = jax.device_put(dst)
    gaps = jax.device_put(np.full((t_block,), 10.0, np.float32))
    jax.block_until_ready((dst_d, gaps))

    def slope_of(step, label, lo=4, hi=36, reps=4):
        def run_n(k):
            t0 = time.time()
            out = step(k)
            jax.block_until_ready(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf)).ravel()[:1]
            return time.time() - t0
        run_n(2)
        vals = []
        for _ in range(reps):
            t_lo = run_n(lo)
            t_hi = run_n(hi)
            vals.append((t_hi - t_lo) / (hi - lo))
        s = min(vals)
        print(f"{label:34s} {s * 1e3:9.3f} ms/block "
              f"({[round(v * 1e3, 1) for v in vals]})")
        return s

    def full(k):
        out = None
        for i in range(k):
            # vary the gap so calls chain through a fresh input each time
            out = hough.hough_lines_batch(
                dst_d, gaps + jnp.float32(i % 3), threshold=10, min_len=10)
        return out.lines
    slope_of(full, "FULL hough_lines_batch (dense)")

    # stage: compaction only
    flat = (dst_d > 0).astype(jnp.uint8).reshape(t_block, -1)

    @jax.jit
    def compact(f):
        idx, valid = jax.vmap(
            lambda x: hough._compact_indices(x, 8192))(f)
        return idx, valid
    idx0, valid0 = jax.block_until_ready(compact(flat))

    def comp(k):
        out = None
        f = flat
        for i in range(k):
            out = compact(f)
            f = flat ^ (out[1][:, :1] & False).astype(jnp.uint8)  # chain dep
        return out[0]
    slope_of(comp, "compaction (8192)")

    # stage: Pallas vote on the compacted points
    n_rho = hough._round_up(2 * (w + h) + 1, 128)
    xsf = (jnp.where(valid0, idx0, 0) % w).astype(jnp.float32)
    ysf = (jnp.where(valid0, idx0, 0) // w).astype(jnp.float32)

    def vote(k):
        out = None
        x = xsf
        for i in range(k):
            out = hough_vote_pallas(x, ysf, valid0, n_rho, w + h)
            x = xsf + (out[0, 0, 0] & 0).astype(jnp.float32)  # chain dep
        return out
    slope_of(vote, "hough_vote_pallas (64x8192)")

    # stage: peak find over the dense accumulator
    votes0 = jax.block_until_ready(
        hough_vote_pallas(xsf, ysf, valid0, n_rho, w + h))

    @jax.jit
    def peaks(v):
        return jax.vmap(lambda vv: hough._find_peaks(vv, 10, 64))(v)

    def pk(k):
        out = None
        v = votes0
        for i in range(k):
            out = peaks(v)
            v = votes0 + (out[0][0, 0] & 0)  # chain dep
        return out[0]
    slope_of(pk, "peak find (3x3 NMS + compact)")

    # stage: gather-free segment walk at K=64
    th0, rh0, ok0 = jax.block_until_ready(peaks(votes0))
    s_dim = hough._round_up(max(h, w) + 1, 128)
    imgs01 = (dst_d > 0).astype(jnp.uint8)

    from metdetpy_tpu.ops.pallas_kernels import (_pick_row_bands,
                                                 _use_pallas,
                                                 walk_pick_pallas)
    use_pallas_pick = _use_pallas()

    fc = 8  # mirror hough_lines_batch's chunking (SMEM inputs scale w/ fc)

    @jax.jit
    def walk(imgs, th, rh, ok, g):
        pk_ = hough.pack_corners(imgs)
        pkt = hough.pack_corners(imgs.transpose(0, 2, 1))
        planes = jnp.zeros((fc, 2, s_dim, s_dim), jnp.uint8)
        planes = planes.at[:, 0, :h + 1, :w + 1].set(pk_)
        planes = planes.at[:, 1, :w + 1, :h + 1].set(pkt)
        n_steps = hough._round_up(max(h, w) + 4, 128)
        if use_pallas_pick:  # mirror hough_lines_batch's TPU path
            geom = jax.vmap(
                lambda t, r: hough._walk_geom(t, r, w + h, n_steps,
                                              h, w, s_dim))(th, rh)
            r0 = jax.vmap(
                lambda r, ip: _pick_row_bands(r, ip, s_dim))(
                geom.r, geom.inp)
            v = walk_pick_pallas(planes, geom.r, geom.xmaj, r0)
            return jax.vmap(
                lambda v_, g_, o, gg: hough._finish_segments(
                    v_, g_, o, 10, gg, h, w))(v, geom, ok, g)
        return jax.vmap(
            lambda p2, t, r, o, gg: hough._extract_segments_cols(
                p2, t, r, o, w + h, 10, gg, n_steps, h, w))(
            planes, th, rh, ok, g)

    def wk(k):
        out = None
        g8 = gaps[:fc]
        for i in range(k):
            for c in range(t_block // fc):
                sl = slice(c * fc, (c + 1) * fc)
                out = walk(imgs01[sl], th0[sl], rh0[sl], ok0[sl], g8)
            g8 = gaps[:fc] + (out[0][0, 0, 0] & 0).astype(jnp.float32)
        return out[0]
    slope_of(wk, "segment walk K=64 (incl pack)")

    n_peaks = int(np.asarray(ok0).sum(axis=1).max())
    print(f"max peaks/frame after NMS: {n_peaks}")


if __name__ == "__main__":
    main()
