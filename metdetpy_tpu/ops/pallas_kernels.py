"""Pallas TPU kernels for the detection hot path.

``fused_median_binarize_close`` fuses the post-diff stage of the M3
detector -- 3x3 median, per-frame binary threshold, 3x3 morphological
close -- into a single VMEM-resident kernel: one HBM read and one HBM
write per frame instead of the ~6 tensor materializations of the unfused
XLA graph (replaces cv2.medianBlur/threshold/morphologyEx of the reference,
MetLib/Detector.py:329-341; see SURVEY.md §2.9 "fused Pallas window
kernel").

A full 540x960 uint8 frame is ~0.5 MB, far below the ~16 MB VMEM budget,
so the grid is one program per frame and each program owns the whole frame;
the compute itself sweeps the frame in row strips with 3-row halos because
Mosaic only legalizes vector min/max/compare on 32-bit lanes and full-frame
i32 intermediates would exceed the VMEM budget. Above ~4 MB/frame the
helper falls back to the XLA path automatically.

Semantics match the cv2 defaults exactly (validated against cv2 in tests):
median uses replicate borders; dilate treats out-of-image as 0 and erode as
255 (OpenCV's -inf/+inf border convention on uint8).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import filters

VMEM_FRAME_LIMIT = 4 * 1024 * 1024  # fall back to XLA above ~4 MB/frame





def _median9(v: list[jax.Array]) -> jax.Array:
    pairs = [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
             (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
             (4, 2), (6, 4), (4, 2)]
    v = list(v)
    for i, j in pairs:
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi
    return v[4]


def _max9(wins: list[jax.Array]) -> jax.Array:
    out = wins[0]
    for win in wins[1:]:
        out = jnp.maximum(out, win)
    return out


def _min9(wins: list[jax.Array]) -> jax.Array:
    out = wins[0]
    for win in wins[1:]:
        out = jnp.minimum(out, win)
    return out


STRIP_ROWS = 64  # rows of output produced per in-kernel strip iteration


def _kernel(thr_ref, in_ref, out_ref):
    # Mosaic on this toolchain only legalizes vector min/max/compare for
    # i32/f32, and full-frame i32 intermediates blow the VMEM budget (the
    # median network keeps ~9 slices live). So the uint8 frame stays
    # resident in VMEM and the kernel sweeps it in row strips, casting each
    # strip (+3-row halo for the median->dilate->erode chain) to i32.
    x_u8 = in_ref[0]
    h, w = x_u8.shape
    thr = thr_ref[pl.program_id(0), 0]

    n_strips = (h + STRIP_ROWS - 1) // STRIP_ROWS
    for k in range(n_strips):  # static unroll: all shapes static
        r0 = k * STRIP_ROWS
        s = min(STRIP_ROWS, h - r0)
        lo = max(r0 - 3, 0)
        hi = min(r0 + s + 3, h)
        strip = x_u8[lo:hi].astype(jnp.int32)  # [hi-lo, w]
        # extend to exactly [s+6, w] with edge replication (frame borders)
        top_pad = lo - (r0 - 3)
        bot_pad = (r0 + s + 3) - hi
        parts = []
        if top_pad:
            parts.extend([strip[0:1]] * top_pad)
        parts.append(strip)
        if bot_pad:
            parts.extend([strip[-1:]] * bot_pad)
        ext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else strip

        # median over rows [r0-2, r0+s+2): replicate-pad columns
        extc = jnp.concatenate([ext[:, 0:1], ext, ext[:, -1:]], axis=1)
        med = _median9([extc[dy:dy + s + 4, dx:dx + w]
                        for dy in range(3) for dx in range(3)])
        binary = jnp.where(med > thr, 255, 0)  # rows [r0-2, r0+s+2)
        # out-of-frame rows read 0 for dilation (cv2 border convention)
        row_ids = (jax.lax.broadcasted_iota(jnp.int32, (s + 4, w), 0)
                   + (r0 - 2))
        binary = jnp.where((row_ids >= 0) & (row_ids < h), binary, 0)
        binc = jnp.concatenate(
            [jnp.zeros((s + 4, 1), jnp.int32), binary,
             jnp.zeros((s + 4, 1), jnp.int32)], axis=1)
        dil = _max9([binc[dy:dy + s + 2, dx:dx + w]
                     for dy in range(3) for dx in range(3)])
        # out-of-frame rows read 255 for erosion; rows [r0-1, r0+s+1)
        row_ids2 = (jax.lax.broadcasted_iota(jnp.int32, (s + 2, w), 0)
                    + (r0 - 1))
        dil = jnp.where((row_ids2 >= 0) & (row_ids2 < h), dil, 255)
        dilc = jnp.concatenate(
            [jnp.full((s + 2, 1), 255, jnp.int32), dil,
             jnp.full((s + 2, 1), 255, jnp.int32)], axis=1)
        closed = _min9([dilc[dy:dy + s, dx:dx + w]
                        for dy in range(3) for dx in range(3)])
        out_ref[0, r0:r0 + s, :] = closed.astype(jnp.uint8)


@jax.jit
def _fused_pallas(diff: jax.Array, thr: jax.Array) -> jax.Array:
    t, h, w = diff.shape
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.uint8),
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [T,1] thr array
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(thr.reshape(t, 1).astype(jnp.int32), diff)


def _use_pallas() -> bool:
    """Default ON for TPU backends; METDETPY_TPU_USE_PALLAS=0/1 overrides.

    Measured on the v5e dev chip (2026-08-18, 64x540x960 u8, slope-timed
    chained execution with a forcing fetch -- see bench._chained_slope;
    the 2026-08-16 "4.20 vs 5.71 ms" numbers were enqueue-rate mirages
    but pointed the same way): Pallas 1.93 ms/block vs XLA 3.45 ms/block
    -- 1.79x faster, bit-exact. Non-TPU backends always take the XLA path
    (Mosaic kernels don't lower there)."""
    flag = os.environ.get("METDETPY_TPU_USE_PALLAS")
    if flag is not None:
        return flag not in ("0", "false", "off")
    try:
        import jax
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def fused_median_binarize_close(diff: jax.Array,
                                thr: jax.Array) -> jax.Array:
    """median3x3 -> (x > thr[t]) * 255 -> close3x3 over a [T, H, W] block.

    Uses the fused Pallas kernel on TPU backends (frames must fit VMEM);
    falls back to the equivalent XLA ops elsewhere.
    """
    t, h, w = diff.shape
    if _use_pallas() and h * w <= VMEM_FRAME_LIMIT:
        return _fused_pallas(diff, thr)
    binary = filters.binary_threshold(filters.median3x3(diff),
                                      thr[:, None, None])
    return filters.close3x3(binary)


# -- fused temporal window max/mean/diff ------------------------------------

WD_VMEM_BUDGET = 10 * 1024 * 1024  # working-set cap for the window kernel


def _wd_kernel(len_ref, seq_ref, out_ref, *, n: int, t_block: int):
    """Per row-band: trailing-window max & integer mean over time, diff out.

    seq_ref: [n_total, S, W] uint8 (n-1 history frames + T new frames);
    out_ref: [T, S, W] uint8 diff = win_max - (win_sum // length);
    len_ref: [T, 1] int32 warmup-aware window lengths (min(n, timer)).

    Window max uses the van Herk-Gil-Werman two-sweep (per-segment suffix
    then prefix maxima, segments of exactly n) -- ~2 vector ops per input
    frame instead of the n-tap reduction; window sum is a running cumsum
    plus one subtract per output.
    """
    n_total = t_block + n - 1
    x = seq_ref[...]

    def xi(i):
        return x[i].astype(jnp.int32)

    # segment suffix/prefix maxima (segment length == n, last may be short)
    sfx: list = [None] * n_total
    pfx: list = [None] * n_total
    for s0 in range(0, n_total, n):
        s1 = min(s0 + n, n_total)
        acc = xi(s1 - 1)
        sfx[s1 - 1] = acc
        for i in range(s1 - 2, s0 - 1, -1):
            acc = jnp.maximum(acc, xi(i))
            sfx[i] = acc
        acc = xi(s0)
        pfx[s0] = acc
        for i in range(s0 + 1, s1):
            acc = jnp.maximum(acc, xi(i))
            pfx[i] = acc

    # running cumsum over time (uint8 sums of <= n frames fit i32 easily)
    cs: list = [None] * n_total
    acc = xi(0)
    cs[0] = acc
    for i in range(1, n_total):
        acc = acc + xi(i)
        cs[i] = acc

    for t in range(t_block):
        win_max = jnp.maximum(sfx[t], pfx[t + n - 1])
        win_sum = cs[t + n - 1] - (cs[t - 1] if t > 0 else 0)
        ln = len_ref[t, 0].astype(jnp.float32)
        # f32 floor-division is exact here: quotient <= 255, so the true
        # quotient's distance to the nearest other integer (>= 1/length)
        # dwarfs the half-ulp rounding error of a correctly-rounded divide
        mean = jnp.floor(win_sum.astype(jnp.float32) / ln).astype(jnp.int32)
        out_ref[t] = (win_max - mean).astype(jnp.uint8)


def _wd_kernel_stream(len_ref, seq_ref, out_ref, *, n: int, t_block: int):
    """Segment-streaming variant of :func:`_wd_kernel` with ~n live i32
    arrays instead of ~3*n_total: the rolling sum is maintained
    incrementally (ws(t) = ws(t-1) + x[t+n-1] - x[t-1], exact in i32) and
    the van Herk prefix maxima are a single running accumulator that
    resets at each segment boundary, so only the current segment's suffix
    maxima stay live. Outputs are bit-identical to :func:`_wd_kernel`."""
    x = seq_ref[...]

    def xi(i):
        return x[i].astype(jnp.int32)

    # rolling-sum init: sum over the first window [0, n)
    ws = xi(0)
    for i in range(1, n):
        ws = ws + xi(i)

    def emit(t, win_max, win_sum):
        ln = len_ref[t, 0].astype(jnp.float32)
        # f32 floor-division is exact here (quotient <= 255; see
        # _wd_kernel's note)
        mean = jnp.floor(win_sum.astype(jnp.float32) / ln).astype(jnp.int32)
        out_ref[t] = (win_max - mean).astype(jnp.uint8)

    for s0 in range(0, t_block, n):  # segments containing output starts
        s1 = s0 + n  # never short: s0 <= t_block-1 => s1 <= n_total
        # suffix maxima over segment [s0, s1)
        sfx: list = [None] * n
        acc = xi(s1 - 1)
        sfx[n - 1] = acc
        for i in range(s1 - 2, s0 - 1, -1):
            acc = jnp.maximum(acc, xi(i))
            sfx[i - s0] = acc
        pacc = None
        for t in range(s0, min(s0 + n, t_block)):
            if t == s0:
                win_max = sfx[0]  # window == segment exactly
            else:
                pacc = xi(t + n - 1) if pacc is None else \
                    jnp.maximum(pacc, xi(t + n - 1))
                win_max = jnp.maximum(sfx[t - s0], pacc)
            if t > 0:
                ws = ws + xi(t + n - 1) - xi(t - 1)
            emit(t, win_max, ws)


@functools.partial(jax.jit, static_argnames=("n",))
def _wd_pallas(seq: jax.Array, lengths: jax.Array, n: int) -> jax.Array:
    n_total, h, w = seq.shape
    t_block = n_total - (n - 1)
    stream = os.environ.get("METDETPY_TPU_WD_STREAM", "1") \
        not in ("0", "false", "off")
    if stream:
        kernel = functools.partial(_wd_kernel_stream, n=n, t_block=t_block)
        # live i32 set: segment suffix maxima (n) + a few accumulators,
        # plus the u8 seq block and u8 out block
        bytes_per_row = (4 * (n + 4) + n_total + t_block) * w
        s_rows = 32
        while s_rows > 1 and bytes_per_row * s_rows > WD_VMEM_BUDGET:
            s_rows //= 2
    else:
        kernel = functools.partial(_wd_kernel, n=n, t_block=t_block)
        # pick the largest band height whose i32 working set fits the
        # budget (x + suffix/prefix maxima + cumsum live at once: ~13
        # B per elem)
        s_rows = 8
        while s_rows > 1 and 13 * n_total * s_rows * w > WD_VMEM_BUDGET:
            s_rows //= 2
    h_pad = _round_up(h, s_rows)
    if h_pad != h:
        seq = jnp.pad(seq, ((0, 0), (0, h_pad - h), (0, 0)))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_block, h_pad, w), jnp.uint8),
        grid=(h_pad // s_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [T, 1] lengths
            pl.BlockSpec((n_total, s_rows, w), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_block, s_rows, w), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
    )(lengths.reshape(t_block, 1).astype(jnp.int32), seq)
    return out[:, :h, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# -- segment-walk pick: VMEM-resident one-hot row selection ------------------


WALK_COL_TILE = 128   # columns per pick tile
WALK_ROW_BAND = 256   # plane rows scanned per tile (>= 128-col row span)


def _pick_row_bands(r: jax.Array, inp: jax.Array, s_dim: int) -> jax.Array:
    """Per-(peak, col-tile) plane-row window start for the banded pick.

    Because the walk's row index moves by at most 1 per column, the rows
    touched by VALID columns of one WALK_COL_TILE-wide tile span <= 128
    values, so a WALK_ROW_BAND-row window suffices. Invalid columns'
    rows may fall outside the window -- their picks are garbage either
    way and are masked by ``inp`` downstream (exactly as in the unbanded
    form, whose out-of-plane rows pick 0). r: [K, S] i32; inp: [K, S]
    bool. Returns [K, S / WALK_COL_TILE] i32 window starts.
    """
    k, s = r.shape
    r_valid = jnp.where(inp, r, s_dim)  # +inf analog for the min
    r_min = jnp.min(r_valid.reshape(k, s // WALK_COL_TILE, WALK_COL_TILE),
                    axis=2)
    r0 = jnp.clip(r_min, 0, max(s_dim - WALK_ROW_BAND, 0))
    # Mosaic requires dynamic sublane starts to be PROVABLY tile-aligned,
    # so the window start ships as a count of 32-row units (the kernel
    # multiplies back -- 32*x is provably 8-aligned); rounding down costs
    # <= 31 rows of the 256-128 band slack
    return r0 >> 5


WALK_PEAK_GROUP = 8   # peaks per program (static unroll; sublane-aligned)


def _walk_pick_kernel(xmaj_ref, r0_ref, planes_ref, r_ref, out_ref, *,
                      s_dim: int):
    """v[k, c] = planes[xmaj_k ? 0 : 1][r[k, c], c] for one peak group.

    The XLA one-hot form materializes [K, S, S] intermediates in HBM
    (~0.33 ms/frame = 20.8 ms of the dense 64-frame block at K=64,
    S=1024); here the compare-select-reduce runs entirely in VMEM over
    the resident packed planes, each peak touches only ONE plane (a
    lax.cond on an SMEM selector), and each column tile scans only a
    WALK_ROW_BAND-row window around the line (the row index moves <= 1
    per column, so a full-height scan wastes ~4x the work). Peaks are
    statically unrolled within a WALK_PEAK_GROUP-sized grid block --
    Mosaic forbids dynamic sublane indexing (loads and stores), so a
    fori_loop over peaks cannot slice r/out rows at a traced index.
    """
    i = pl.program_id(0)
    g = pl.program_id(1)
    band = min(WALK_ROW_BAND, s_dim)
    n_tiles = s_dim // WALK_COL_TILE
    kg = r_ref.shape[1]

    for kk in range(kg):  # static unroll
        def pick(pi: int, kk=kk):
            tiles = []
            for j in range(n_tiles):  # static unroll
                sl_j = slice(j * WALK_COL_TILE, (j + 1) * WALK_COL_TILE)
                r_tile = r_ref[0, kk:kk + 1, sl_j]
                # 32-row units -> provably 8-aligned sublane start
                r0 = r0_ref[i, g * kg + kk, j] * 32
                win = planes_ref[0, pi, pl.ds(r0, band), sl_j]
                rows = (jax.lax.broadcasted_iota(
                    jnp.int32, (band, WALK_COL_TILE), 0) + r0)
                oh = rows == r_tile                   # [band, tile]
                tiles.append(jnp.sum(
                    jnp.where(oh, win.astype(jnp.int32), 0),
                    axis=0, keepdims=True))           # [1, tile]
            return jnp.concatenate(tiles, axis=1)     # [1, S]

        v = jax.lax.cond(xmaj_ref[i, g * kg + kk] == 1,
                         lambda kk=kk: pick(0, kk),
                         lambda kk=kk: pick(1, kk))
        out_ref[0, kk:kk + 1, :] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def walk_pick_pallas(planes: jax.Array, r: jax.Array, xmaj: jax.Array,
                     r0: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched per-column row-pick from the packed corner planes.

    planes: [T, 2, S, S] uint8; r: [T, K, S] int32 row per column;
    xmaj: [T, K] bool per-peak plane selector; r0: [T, K, S/128] i32
    row-window starts in 32-row units from :func:`_pick_row_bands`.
    Returns [T, K, S] int32, identical to hough._picks_onehot on every
    column the walk keeps (pinned by tests; invalid columns may differ
    and are masked). K is padded up to the next WALK_PEAK_GROUP multiple
    internally (the XLA fallback path never needed the alignment, so the
    TPU path must not crash on e.g. K=20 either -- ADVICE r4).
    """
    t, k_peaks, s_dim = r.shape
    k_pad = -k_peaks % WALK_PEAK_GROUP
    if k_pad:
        r = jnp.concatenate(
            [r, jnp.broadcast_to(r[:, :1], (t, k_pad, s_dim))], axis=1)
        xmaj = jnp.concatenate(
            [xmaj, jnp.broadcast_to(xmaj[:, :1], (t, k_pad))], axis=1)
        r0 = jnp.concatenate(
            [r0, jnp.broadcast_to(r0[:, :1], (t, k_pad, r0.shape[2]))],
            axis=1)
        k_peaks += k_pad
    n_groups = k_peaks // WALK_PEAK_GROUP
    out = pl.pallas_call(
        functools.partial(_walk_pick_kernel, s_dim=s_dim),
        out_shape=jax.ShapeDtypeStruct((t, k_peaks, s_dim), jnp.int32),
        grid=(t, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # [T, K] xmaj i32
            pl.BlockSpec(memory_space=pltpu.SMEM),   # [T, K, n_tiles] r0
            # the plane block's index is g-invariant, so Pallas fetches
            # it once per frame (g varies fastest)
            pl.BlockSpec((1, 2, s_dim, s_dim), lambda i, g: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WALK_PEAK_GROUP, s_dim),
                         lambda i, g: (i, g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, WALK_PEAK_GROUP, s_dim),
                               lambda i, g: (i, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xmaj.astype(jnp.int32), r0, planes, r)
    return out[:, :k_peaks - k_pad] if k_pad else out


# -- Hough vote: VMEM-resident one-hot matmuls -------------------------------

VOTE_THETA_CHUNK = 4  # thetas per program at N <= 8192 points


def _vote_theta_chunk(n: int) -> int:
    """Thetas per program, scaled so the unrolled one-hot liveness fits
    VMEM: the dominant temporary is the [128, N] bf16 lo one-hot per
    unrolled theta (~N/4 KB); 4 x 8192 measured fastest of the fitting
    configs, 30 x 8192 OOM'd scoped VMEM at 39.5 MB. Must divide 180.
    ClassicDetector's 4x point budget (N = 32768) lands on 1."""
    if n <= 8192:
        return VOTE_THETA_CHUNK
    return 2 if n <= 16384 else 1


def _vote_kernel(cos_ref, sin_ref, xs_ref, ys_ref, v_ref, out_ref, *,
                 c_chunk: int, n_hi: int, n_rho: int, rho_offset: int):
    """One (frame, theta-chunk) program of the Hough vote.

    Same hi/lo one-hot-matmul decomposition as hough._vote (rho split into
    hi = rho // 128, lo = rho % 128; votes[hi, lo] = onehot_hi @
    onehot_lo), but the one-hots are GENERATED in VMEM and consumed by the
    MXU without ever touching HBM. The XLA form materializes ~450 MB of
    one-hot operands per dense 8192-point frame (its actual cost at HBM
    bandwidth); here per-frame HBM traffic is the point list in (~100 KB)
    and the votes out (~2 MB). Both one-hots are generated LANE-major over
    the point axis ([n_hi, N] and [LANE, N]) and the dot contracts the
    lane axis of both operands -- no [N, 1] layouts (a [N, 1] f32 vector
    pads to full 128-lane tiles, a 128x VMEM blowup). bf16 operands with
    f32 accumulation are exact: products are 0/1 and row sums <= N <<
    2^24.
    """
    n = xs_ref.shape[-1]
    c0 = pl.program_id(1) * c_chunk
    x = xs_ref[0]                                    # [1, N] f32
    y = ys_ref[0]
    vld = v_ref[0].astype(jnp.bfloat16)              # [1, N]
    for j in range(c_chunk):                          # static unroll
        cs = cos_ref[c0 + j, 0]
        sn = sin_ref[c0 + j, 0]
        rho = cs * x + sn * y + jnp.float32(rho_offset)
        q = jnp.clip(jnp.round(rho).astype(jnp.int32), 0, n_rho - 1)
        hi, lo = q // 128, q % 128                    # [1, N]
        ohh = (jax.lax.broadcasted_iota(jnp.int32, (n_hi, n), 0)
               == hi).astype(jnp.bfloat16) * vld
        ohl = (jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
               == lo).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            ohh, ohl, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [n_hi, 128]
        out_ref[0, j] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_rho", "rho_offset",
                                              "interpret"))
def hough_vote_pallas(xs: jax.Array, ys: jax.Array, valid: jax.Array,
                      n_rho: int, rho_offset: int,
                      interpret: bool = False) -> jax.Array:
    """Batched Hough vote: [T, N] compacted points -> [T, 180, n_rho] i32.

    Bit-identical to the XLA hi/lo one-hot path (hough._vote) -- pinned by
    tests/test_pallas.py -- at ~1/200th the HBM traffic. The cos/sin
    tables are computed with the same jnp ops as hough._vote and fed via
    SMEM so both paths quantize rho identically.
    """
    t, n = xs.shape
    n_theta, c_chunk = 180, _vote_theta_chunk(n)
    n_hi = n_rho // 128
    thetas = (jnp.arange(n_theta, dtype=jnp.float32)
              * jnp.float32(np.pi / 180))
    cos_t = jnp.cos(thetas).reshape(n_theta, 1)
    sin_t = jnp.sin(thetas).reshape(n_theta, 1)
    votes4 = pl.pallas_call(
        functools.partial(_vote_kernel, c_chunk=c_chunk, n_hi=n_hi,
                          n_rho=n_rho, rho_offset=rho_offset),
        out_shape=jax.ShapeDtypeStruct((t, n_theta, n_hi, 128), jnp.int32),
        grid=(t, n_theta // c_chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cos table [180, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sin table [180, 1]
            pl.BlockSpec((1, 1, n), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_chunk, n_hi, 128),
                               lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cos_t, sin_t, xs[:, None], ys[:, None],
      valid.astype(jnp.float32)[:, None])
    return votes4.reshape(t, n_theta, n_hi * 128)


def window_diff(history: jax.Array, frames: jax.Array, n: int,
                timer0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Trailing-window (max - integer mean) over a block, carrying history.

    The M3 detector's window-stats stage reduced to exactly what its
    downstream consumes (reference M3Detector.detect diff, MetLib/
    Detector.py:324-341): one fused Pallas pass on TPU (profiled 3.9 ms ->
    sub-ms per 64x540x960 block vs the XLA reduce_window graph, which
    materializes u32 casts and rolling sums in HBM); XLA fallback
    elsewhere. Returns (diff [T, H, W] u8, new_history [n-1, H, W] u8).
    """
    t_block = frames.shape[0]
    if n >= 2 and _use_pallas():
        seq = jnp.concatenate([history, frames], axis=0)
        timers = timer0 + 1 + jnp.arange(t_block, dtype=jnp.int32)
        lengths = jnp.minimum(timers, n)
        return _wd_pallas(seq, lengths, n), seq[t_block:]
    from . import windows
    stats, new_hist = windows.window_stats(history, frames, n, timer0)
    return stats.diff, new_hist
