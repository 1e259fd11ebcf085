"""Device-side MFNR mixed stacking.

The host path (ops.stack.mfnr_mix_stacker) implements the reference's
pixel math (reference MetLib/stacker.py:296-403) in numpy/cv2; this module
runs the same math as jitted [T, H, W, 3] tensor programs on the
accelerator (SURVEY §2.9 maps the GaussianBlur/feather/blend chain to
jax), streaming decode blocks through device carries:

  per block:   max, sum (u32), square-sum (u32) accumulate on device
               (the streaming FastGaussianParam analog,
               reference MetLib/utils.py:418-513)
  at export:   background estimate (mean / median / sigma-clipping),
               Gumbel expected-max correction, foreground mask +
               separable Gaussian feather (cv2.getGaussianKernel
               coefficients, REFLECT_101 borders), highlight-protected
               brightness fix, max/mean blend -- one fused jit program.

``connect_lines`` (contour-based trail reconnection) stays host-side: it
is a single-image OpenCV findContours pass, so the device program splits
around it when enabled.

Output parity with the host path is within +/-1 gray level (f32 vs f64
reductions); pinned by tests/test_stack.py.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import numpy as np

from ..log import BaseMetLog, get_useable_logger
from ..structs import DenoiseOption

DEVICE_BLOCK = 16  # frames uploaded per carry update

# stage accounting of the most recent mfnr_mix_device run (placement
# mode, per-stage seconds, uploaded bytes) -- read by bench/denoise
# artifacts; best-effort, not part of the public API
last_run_stats: dict = {}


def _gaussian_kernel_f32(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel coefficients (the exact taps GaussianBlur
    uses), as f32 [ksize]."""
    import cv2
    return cv2.getGaussianKernel(ksize, sigma).astype(np.float32).ravel()


def _blur_reflect101(img, taps):
    """Separable Gaussian blur of a [H, W] f32 image with cv2's default
    BORDER_REFLECT_101 padding (np/jnp pad mode='reflect')."""
    import jax.numpy as jnp
    k = taps.shape[0]
    r = k // 2
    x = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # horizontal then vertical 1-D convolutions via explicit taps (k is
    # small and static; XLA fuses the shifted adds)
    h = sum(taps[i] * x[:, i:i + img.shape[1]] for i in range(k))
    v = sum(taps[i] * h[i:i + img.shape[0], :] for i in range(k))
    return v


@functools.partial(__import__("jax").jit, donate_argnums=(0, 1, 2))
def _acc_update(mx, s, sq, block):
    import jax.numpy as jnp
    bmax = jnp.max(block, axis=0)
    mx = jnp.maximum(mx, bmax)
    b32 = block.astype(jnp.uint32)
    s = s + jnp.sum(b32, axis=0)
    sq = sq + jnp.sum(b32 * b32, axis=0)
    return mx, s, sq


def _jit_stage1(mx, s, sq, n, bg_mu, bg_var, taps, *, hp, gumbel,
                bg_fix_factor, use_ext_bg, use_ext_var):
    """Stats + foreground mask + feather. Returns (est_bg_mu f32,
    est_bg_var scalar f32, max_bias f32, fg_blur f32[H,W,1])."""
    import jax.numpy as jnp
    nf = jnp.float32(n)
    sf = s.astype(jnp.float32)
    if use_ext_bg:
        # f32 plane from the median/sigma paths; u8 mu plane from the
        # host-reduced "mean" upload
        est_bg_mu = bg_mu.astype(jnp.float32)
    else:
        # FastGaussianParam.mu = round(sum / n), round-half-to-even like
        # np.round (reference MetLib/utils.py:442-447)
        est_bg_mu = jnp.round(sf / nf)
    if use_ext_var:
        est_bg_var = bg_var
    else:
        var = (sq.astype(jnp.float32) - sf * sf / nf) / (nf - 1.0)
        est_bg_var = jnp.mean(jnp.sqrt(jnp.maximum(var, 0.0)))
    max_f = mx.astype(jnp.float32)
    bg_lift = est_bg_var * jnp.float32(gumbel) * jnp.float32(bg_fix_factor)
    max_bias = max_f - est_bg_mu - bg_lift
    pos = max_bias > 0
    highlight_avg = (jnp.sum(jnp.where(pos, max_bias, 0.0))
                     / jnp.maximum(jnp.sum(pos), 1))
    fg_any = jnp.any((max_bias > highlight_avg) | (max_f > 255.0 * hp),
                     axis=-1).astype(jnp.float32)
    fg_blur = _blur_reflect101(fg_any, taps)[..., None]
    return est_bg_mu, est_bg_var, max_bias, fg_blur


def _jit_stage2(mx, est_bg_mu, est_bg_var, fg_blur, *, hp, gumbel):
    """Highlight-protected brightness fix + max/mean blend -> u8."""
    import jax.numpy as jnp
    max_f = mx.astype(jnp.float32)
    fix_factor = 1.0 - jnp.clip(max_f / 255.0 - hp, 0.0, 1.0) / (1.0 - hp)
    fixed_max = jnp.clip(max_f - est_bg_var * jnp.float32(gumbel)
                         * fix_factor, 0.0, 255.0)
    mixed = jnp.round(fixed_max * fg_blur + est_bg_mu * (1.0 - fg_blur))
    return mixed.astype(jnp.uint8)


def _jit_blur_blend(packed, bg_var, taps, *, hp, gumbel):
    """Host-reduced placement's device program: feather blur of the
    host-computed fg mask + the stage-2 blend, one fused dispatch.

    ``packed`` is a single [H, W, 7] u8 buffer (ch 0-2 max, 3-5 mu,
    6 fg mask) -- one contiguous upload instead of three: on the
    tunneled transport each staging op pays a round trip, so op count
    matters as much as bytes."""
    import jax.numpy as jnp
    mx = packed[..., 0:3]
    bg_mu = packed[..., 3:6]
    fg_any = packed[..., 6]
    fg_blur = _blur_reflect101(fg_any.astype(jnp.float32), taps)[..., None]
    return _jit_stage2(mx, bg_mu.astype(jnp.float32), bg_var, fg_blur,
                       hp=hp, gumbel=gumbel)


def mfnr_mix_device(video_loader, denoise_cfg: DenoiseOption,
                    start_frame=None, end_frame=None,
                    logger: Optional[BaseMetLog] = None
                    ) -> Optional[np.ndarray]:
    """Device MFNR export: stream decode blocks into device carries, run
    the pixel math as two fused jit programs. Same semantics as
    ops.stack.mfnr_mix_stacker (reference MetLib/stacker.py:296-403);
    output within +/-1 gray level of the host path.

    Raises on device/transport failure -- the caller
    (stack.mfnr_mix_stacker) falls back to the host path.
    """
    import jax
    import jax.numpy as jnp

    from . import stack as hs  # host-side helpers shared verbatim

    logger = get_useable_logger(logger)
    hp, blur_ksize = denoise_cfg.highlight_preserve, denoise_cfg.blur_ksize
    connect_cfg, mfnr = denoise_cfg.connect_lines, denoise_cfg.mfnr_param
    assert mfnr.bg_algorithm in hs.SUPPORT_BG_ALGO, \
        f"unsupported bg algo {mfnr.bg_algorithm}"
    keep_stack = mfnr.bg_algorithm not in ("mean",)

    if start_frame is not None or end_frame is not None:
        video_loader.reset(start_frame=start_frame, end_frame=end_frame)
    mx = s = sq = None
    n = 0
    dev_blocks: list[Any] = []
    pend: list[np.ndarray] = []

    # For the "mean" background the stack itself is never needed on
    # device -- and neither are the raw sum/sqsum planes: the pixel math
    # consumes only the ROUNDED MEAN plane (u8, FastGaussianParam.mu
    # semantics) and the SCALAR bg std. Streaming the reduction on the
    # HOST during decode and uploading just (max u8, mu u8) + one scalar
    # (2 B/px, ~12 MB at 64x1080p color) instead of every frame
    # (3 B/px/frame, ~398 MB) or the 9 B/px raw planes makes the device
    # path win on any link above ~8 MB/s -- including this dev tunnel's
    # degraded synchronous mode. On a fast link the device accumulate
    # wins outright (no host passes at all). Decided per run from a
    # measured host-accumulate pilot vs the probed link rate.
    import os as _os
    host_reduce = False
    hr_env = _os.environ.get("METDETPY_TPU_MFNR_HOST_REDUCE")
    if not keep_stack and hr_env is not None:
        host_reduce = hr_env != "0"
    elif not keep_stack:
        try:
            h2d, _ = hs._probe_link_bps()
            w_, h_ = video_loader.runtime_size
            frames_total = video_loader.iterations
            full_bytes = frames_total * h_ * w_ * 3
            red_bytes = 2 * h_ * w_ * 3
            # pilot: accumulate 2 synthetic frames at runtime size
            import time as _t
            pf = np.zeros((h_, w_, 3), np.uint8)
            pmx = np.zeros_like(pf)
            ps = np.zeros((h_, w_, 3), np.uint32)
            psq = np.zeros((h_, w_, 3), np.uint32)
            ptmp = np.empty((h_, w_, 3), np.uint32)
            t0 = _t.perf_counter()
            for _ in range(2):
                np.maximum(pmx, pf, out=pmx)
                ptmp[:] = pf
                ps += ptmp
                ptmp *= ptmp
                psq += ptmp
            t_acc_frame = (_t.perf_counter() - t0) / 2
            t_full = full_bytes / h2d
            t_red = red_bytes / h2d + frames_total * t_acc_frame
            host_reduce = t_red < t_full
            logger.debug(
                f"MFNR placement: host-accumulate pilot "
                f"{t_acc_frame * 1e3:.1f} ms/frame, link "
                f"{h2d / 1e6:.0f} MB/s -> "
                f"{'host-reduced' if host_reduce else 'full'} upload "
                f"(est {min(t_red, t_full):.2f}s vs "
                f"{max(t_red, t_full):.2f}s).")
        except Exception:
            host_reduce = False
    hmx = hs_ = hsq = htmp = None
    last_run_stats.clear()
    last_run_stats["placement"] = ("host-reduced-upload" if host_reduce
                                   else "full-upload")

    def flush():
        nonlocal mx, s, sq, n
        if not pend:
            return
        block = jax.device_put(np.stack(pend))
        if keep_stack:
            dev_blocks.append(block)
        if mx is None:
            h, w, c = pend[0].shape
            mx = jnp.zeros((h, w, c), jnp.uint8)
            s = jnp.zeros((h, w, c), jnp.uint32)
            sq = jnp.zeros((h, w, c), jnp.uint32)
        mx, s, sq = _acc_update(mx, s, sq, block)
        n += len(pend)
        pend.clear()

    import time as _time
    t_loop0 = _time.perf_counter()
    try:
        video_loader.start()
        for _ in range(video_loader.iterations):
            frame = video_loader.pop()
            if frame is None:
                break
            if host_reduce:
                f = np.asarray(frame)
                if hmx is None:
                    hmx = np.zeros_like(f)
                    hs_ = np.zeros(f.shape, np.uint32)
                    hsq = np.zeros(f.shape, np.uint32)
                    htmp = np.empty(f.shape, np.uint16)
                np.maximum(hmx, f, out=hmx)
                # u16 staging: sum increments and u8 squares (<= 255^2)
                # both fit u16, halving the accumulate's memory traffic
                # vs u32 temporaries on the 1-core host
                np.multiply(f, f, out=htmp, dtype=np.uint16, casting="unsafe")
                np.add(hsq, htmp, out=hsq, casting="unsafe")
                np.add(hs_, f, out=hs_, casting="unsafe")
                n += 1
                continue
            pend.append(np.asarray(frame))
            if len(pend) >= DEVICE_BLOCK:
                flush()
        flush()
    finally:
        video_loader.stop()
    last_run_stats["decode_acc_s"] = round(
        _time.perf_counter() - t_loop0, 3)
    t_up0 = _time.perf_counter()
    if host_reduce and hmx is not None:
        # fold sum/sqsum down on host: the device blend only consumes
        # the rounded mean plane and the scalar bg std (host math
        # mirrors the device ops -- f32 sum cast, f32 divide, round
        # half-to-even -- so mu is bit-equal to the full-upload path;
        # the scalar differs by reduction-order ULPs only). Stage-1's
        # bias/fg-mask stats (and the optional contour reconnection)
        # also run here: every input is already host-resident, and
        # shipping the f32 bias plane down for connect_lines (~25 MB at
        # 1080p color) costs more on a slow link than the math does on
        # one core. The device keeps the feather blur + blend.
        nf = np.float32(n)
        sf = hs_.astype(np.float32)
        host_bg = np.round(sf / nf).astype(np.uint8)
        var = hsq.astype(np.float32)
        var -= sf * sf / nf
        var /= nf - 1.0
        host_var = float(np.mean(np.sqrt(np.maximum(var, 0.0, out=var))))
        gumbel = hs.get_gumbel_mean(n)
        max_f = hmx.astype(np.float32)
        max_bias = max_f - host_bg.astype(np.float32)
        max_bias -= np.float32(host_var * gumbel
                               * float(mfnr.bg_fix_factor))
        pos_bias = max_bias[max_bias > 0]
        highlight_avg = np.float32(pos_bias.mean() if pos_bias.size
                                   else 0.0)
        fg_any = np.any((max_bias > highlight_avg)
                        | (max_f > 255.0 * float(hp)),
                        axis=-1).astype(np.uint8)
        if connect_cfg.switch:
            hmx = hs.connect_highlight_area(
                hmx, max_bias, rep_times=1,
                ksize_multiplier=connect_cfg.ksize_multiplier,
                clip_threshold=connect_cfg.threshold,
                gamma=connect_cfg.gamma, logger=logger)
        last_run_stats["host_stage_s"] = round(
            _time.perf_counter() - t_up0, 3)
        t_up0 = _time.perf_counter()
        # Outside the feathered fg support, the blend reduces to
        # round(mu * 1.0) == the mu plane itself (bit-exact: mu is u8),
        # so the device only ever needs the fg bounding box padded by
        # the blur radius. Meteors are sparse; the window is typically
        # a few % of the frame, cutting link bytes accordingly. fg
        # beyond the window is impossible (the box covers all fg pixels
        # + radius), so window-reflect blur == full-frame blur there.
        h_, w_ = fg_any.shape
        ys, xs = np.nonzero(fg_any)
        if ys.size == 0:
            last_run_stats["h2d_bytes"] = 0
            last_run_stats["upload_s"] = 0.0
            last_run_stats["device_math_fetch_s"] = 0.0
            last_run_stats["window_px_frac"] = 0.0
            return host_bg
        r = int(blur_ksize) // 2
        y0 = max(int(ys.min()) - r, 0)
        y1 = min(int(ys.max()) + 1 + r, h_)
        x0 = max(int(xs.min()) - r, 0)
        x1 = min(int(xs.max()) + 1 + r, w_)
        # pad window dims up to multiples of 64 (bounded compile count;
        # one shape per export in practice), sliding the origin back so
        # the padded window stays inside the frame
        wh = min(-(-(y1 - y0) // 64) * 64, h_)
        ww = min(-(-(x1 - x0) // 64) * 64, w_)
        y0 = min(y0, h_ - wh)
        x0 = min(x0, w_ - ww)
        y1, x1 = y0 + wh, x0 + ww
        frac = (wh * ww) / float(h_ * w_)
        last_run_stats["window_px_frac"] = round(frac, 4)
        full_frame = frac >= 0.98   # whole frame anyway: skip the paste
        packed = np.empty((wh, ww, 7), np.uint8)
        packed[..., 0:3] = hmx[y0:y1, x0:x1]
        packed[..., 3:6] = host_bg[y0:y1, x0:x1]
        packed[..., 6] = fg_any[y0:y1, x0:x1]
        taps = jnp.asarray(_gaussian_kernel_f32(blur_ksize, 3.0))
        blend = jax.jit(functools.partial(_jit_blur_blend, hp=float(hp),
                                          gumbel=gumbel))
        args = (jax.device_put(packed), jnp.float32(host_var), taps)
        last_run_stats["h2d_bytes"] = packed.nbytes
        last_run_stats["upload_s"] = round(
            _time.perf_counter() - t_up0, 3)
        t_math0 = _time.perf_counter()
        win_mixed = np.asarray(blend(*args))
        last_run_stats["device_math_fetch_s"] = round(
            _time.perf_counter() - t_math0, 3)
        if full_frame:
            mixed = win_mixed
        else:
            mixed = host_bg.copy()
            mixed[y0:y1, x0:x1] = win_mixed
        logger.debug(f"MFNR-stacked SNR (device, host-reduced): "
                     f"{hs.estimate_snr_smooth_residual(mixed):.2f} db.")
        return mixed
    if n:
        last_run_stats["h2d_bytes"] = n * int(
            np.prod(video_loader.runtime_size)) * 3
    last_run_stats["upload_s"] = round(_time.perf_counter() - t_up0, 3)
    if n == 0 or mx is None:
        return None
    t_math0 = _time.perf_counter()

    # -- background estimate -------------------------------------------
    use_ext_bg = use_ext_var = False
    bg_mu = jnp.zeros((), jnp.float32)
    bg_var = jnp.zeros((), jnp.float32)
    if mfnr.bg_algorithm in ("median", "med-of-med"):
        stack = jnp.concatenate(dev_blocks, axis=0)
        med = jax.jit(lambda x: jnp.median(x.astype(jnp.float32), axis=0))
        # host parity (stack.mfnr_mix_stacker): exact median for
        # "median" or short stacks; the memory-bounded median-of-medians
        # approximation otherwise (reference MetLib/stacker.py:62-78);
        # est_bg_var still comes from the full-stack stats
        if mfnr.bg_algorithm == "median" or n <= 16:
            bg_mu = med(stack)
        else:
            bs = int(n ** 0.5)
            medians = [med(stack[i:i + bs])
                       for i in range(0, n, bs)]
            bg_mu = med(jnp.stack(medians))
        use_ext_bg = True
    elif mfnr.bg_algorithm == "sigma-clipping":
        stack = jnp.concatenate(dev_blocks, axis=0)

        @jax.jit
        def clipped_stats(stack, s, sq):
            # host parity: single_sigma_clipping rejects against the
            # full-stack mu/std, then BOTH the bg mean and the bg var
            # come from the clipped stats (reference
            # MetLib/stacker.py:91-111 + 335-341)
            nf = jnp.float32(n)
            sf = s.astype(jnp.float32)
            mu = jnp.round(sf / nf)
            std = jnp.sqrt(jnp.maximum(
                (sq.astype(jnp.float32) - sf * sf / nf) / (nf - 1.0), 0.0))
            hi = jnp.clip(jnp.round(mu + mfnr.sigma_high * std),
                          0, 255).astype(jnp.uint8)
            lo = jnp.clip(jnp.round(mu - mfnr.sigma_low * std),
                          0, 255).astype(jnp.uint8)
            reject = (stack > hi[None]) | (stack < lo[None])
            rej = jnp.where(reject, stack, 0).astype(jnp.uint32)
            rs = (s - jnp.sum(rej, axis=0)).astype(jnp.float32)
            rsq = (sq - jnp.sum(rej * rej, axis=0)).astype(jnp.float32)
            rn = nf - jnp.sum(reject, axis=0).astype(jnp.float32)
            cmu = jnp.round(rs / jnp.maximum(rn, 1.0))
            cvar = (rsq - rs * rs / jnp.maximum(rn, 1.0)) \
                / jnp.maximum(rn - 1.0, 1.0)
            cstd = jnp.mean(jnp.sqrt(jnp.maximum(cvar, 0.0)))
            return cmu, cstd

        bg_mu, bg_var = clipped_stats(stack, s, sq)
        use_ext_bg = use_ext_var = True

    gumbel = hs.get_gumbel_mean(n)
    taps = jnp.asarray(_gaussian_kernel_f32(blur_ksize, 3.0))
    stage1 = jax.jit(functools.partial(
        _jit_stage1, hp=float(hp), gumbel=gumbel,
        bg_fix_factor=float(mfnr.bg_fix_factor), use_ext_bg=use_ext_bg,
        use_ext_var=use_ext_var))
    est_bg_mu, est_bg_var, max_bias, fg_blur = stage1(
        mx, s, sq, np.int32(n), bg_mu, bg_var, taps)

    if connect_cfg.switch:
        # contour-based reconnection is host OpenCV work on ONE image;
        # fetch max + bias, reconnect, re-upload the corrected max
        max_host = np.asarray(mx)
        bias_host = np.asarray(max_bias)
        max_host = hs.connect_highlight_area(
            max_host, bias_host, rep_times=1,
            ksize_multiplier=connect_cfg.ksize_multiplier,
            clip_threshold=connect_cfg.threshold,
            gamma=connect_cfg.gamma, logger=logger)
        mx = jax.device_put(max_host)

    stage2 = jax.jit(functools.partial(_jit_stage2, hp=float(hp),
                                       gumbel=gumbel))
    mixed = np.asarray(stage2(mx, est_bg_mu, est_bg_var, fg_blur))
    last_run_stats["device_math_fetch_s"] = round(
        _time.perf_counter() - t_math0, 3)
    logger.debug(f"MFNR-stacked SNR (device): "
                 f"{hs.estimate_snr_smooth_residual(mixed):.2f} db.")
    return mixed
