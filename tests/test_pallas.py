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
