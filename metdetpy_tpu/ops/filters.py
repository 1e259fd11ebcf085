"""Batched 2D image filters as XLA-friendly ops over [..., H, W] blocks.

TPU-native replacements for the OpenCV kernels used by the reference
detectors (cv2.medianBlur / cv2.threshold / cv2.morphologyEx / cv2.dilate /
cv2.erode; reference MetLib/Detector.py:268-341). Everything here is
shape-static, fuses under jit, and vectorizes over leading batch axes.

Border conventions match OpenCV defaults:
  - medianBlur(ksize=3): BORDER_REPLICATE.
  - dilate: constant border of the dtype minimum (border never dilates in).
  - erode: constant border of the dtype maximum (border never erodes in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _sort2(a, b):
    return jnp.minimum(a, b), jnp.maximum(a, b)


def median3x3(img: jax.Array) -> jax.Array:
    """3x3 median filter over the last two axes (replicate border).

    Uses a fixed compare-exchange network (19 min/max pairs) over the nine
    shifted copies -- pure VPU work, no sorting primitives needed.
    """
    h_ax, w_ax = img.ndim - 2, img.ndim - 1
    padded = jnp.pad(
        img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)], mode="edge")

    def shift(dy: int, dx: int) -> jax.Array:
        return lax.slice_in_dim(
            lax.slice_in_dim(padded, dy, dy + img.shape[h_ax], axis=h_ax),
            dx, dx + img.shape[w_ax], axis=w_ax)

    v = [shift(dy, dx) for dy in range(3) for dx in range(3)]
    # median-of-9 network (Paeth's 19-exchange network)
    pairs = [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
             (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
             (4, 2), (6, 4), (4, 2)]
    for i, j in pairs:
        v[i], v[j] = _sort2(v[i], v[j])
    return v[4]


def _pool2d(img: jax.Array, op, init, size: int = 3) -> jax.Array:
    dims = [1] * (img.ndim - 2) + [size, size]
    pad = (size - 1) // 2
    padding = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return lax.reduce_window(img, init, op, dims, [1] * img.ndim, padding)


def dilate3x3(img: jax.Array) -> jax.Array:
    """3x3 rect dilation (max-pool), OpenCV default border semantics."""
    init = jnp.array(0, img.dtype) if jnp.issubdtype(img.dtype, jnp.unsignedinteger) \
        else jnp.array(jnp.iinfo(img.dtype).min if jnp.issubdtype(img.dtype, jnp.integer)
                       else -jnp.inf, img.dtype)
    return _pool2d(img, lax.max, init)


def erode3x3(img: jax.Array) -> jax.Array:
    """3x3 rect erosion (min-pool), OpenCV default border semantics."""
    if jnp.issubdtype(img.dtype, jnp.integer):
        init = jnp.array(jnp.iinfo(img.dtype).max, img.dtype)
    else:
        init = jnp.array(jnp.inf, img.dtype)
    return _pool2d(img, lax.min, init)


def close3x3(img: jax.Array) -> jax.Array:
    """Morphological closing with a 3x3 rect kernel (dilate then erode)."""
    return erode3x3(dilate3x3(img))


def open3x3(img: jax.Array) -> jax.Array:
    """Morphological opening with a 3x3 rect kernel (erode then dilate)."""
    return dilate3x3(erode3x3(img))


def binary_threshold(img: jax.Array, thresh: jax.Array,
                     maxval: int = 255) -> jax.Array:
    """cv2.THRESH_BINARY: maxval where img > thresh else 0.

    ``thresh`` may be a scalar or broadcastable (e.g. per-frame [T, 1, 1]).
    """
    return jnp.where(img > thresh, jnp.uint8(maxval), jnp.uint8(0))
