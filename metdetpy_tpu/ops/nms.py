"""Device-side non-maximum suppression for box predictions.

Replaces cv2.dnn.NMSBoxes (reference MetLib/model.py:277-281, :388-392) with
an O(K^2) IoU-matrix greedy NMS over a fixed candidate budget: score
threshold -> top-K -> iterative suppression via a masked scan. Everything is
shape-static and jit/vmap friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def iou_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU for xyxy boxes: [A, 4] x [B, 4] -> [A, B] float32."""
    ax1, ay1, ax2, ay2 = [boxes_a[:, i:i + 1] for i in range(4)]
    bx1, by1, bx2, by2 = [boxes_b[None, :, i] for i in range(4)]
    ix1 = jnp.maximum(ax1, bx1)
    iy1 = jnp.maximum(ay1, by1)
    ix2 = jnp.minimum(ax2, bx2)
    iy2 = jnp.minimum(ay2, by2)
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_a = jnp.clip(ax2 - ax1, 0) * jnp.clip(ay2 - ay1, 0)
    area_b = jnp.clip(bx2 - bx1, 0) * jnp.clip(by2 - by1, 0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


@functools.partial(jax.jit, static_argnames=("top_k",))
def nms_xyxy(boxes: jax.Array, scores: jax.Array, score_thre: float,
             nms_thre: float, top_k: int = 128) -> tuple[jax.Array, jax.Array]:
    """Greedy NMS matching cv2.dnn.NMSBoxes semantics.

    Args:
      boxes: [N, 4] xyxy float32.
      scores: [N] float32.
      score_thre: minimum score to be considered.
      nms_thre: IoU suppression threshold.
      top_k: static output budget.

    Returns:
      (keep_idx [top_k] int32 into the input arrays, keep_mask [top_k] bool).
    """
    scores = jnp.where(scores >= score_thre, scores, -1.0)
    top_scores, order = lax.top_k(scores, min(top_k, scores.shape[0]))
    cand = boxes[order]
    ious = iou_matrix(cand, cand)
    k = top_scores.shape[0]

    def body(i, keep):
        # survives if no higher-ranked *kept* box overlaps it above threshold
        sup = (ious[i, :i] > nms_thre) & keep[:i] if i > 0 else jnp.zeros(
            (0,), bool)
        alive = jnp.logical_not(jnp.any(sup)) & (top_scores[i] > 0)
        return keep.at[i].set(alive)

    # sequential greedy pass over at most top_k candidates (tiny)
    keep = jnp.zeros((k,), dtype=bool)
    keep = lax.fori_loop(
        0, k,
        lambda i, kp: kp.at[i].set(
            jnp.logical_not(
                jnp.any((ious[i] > nms_thre) & kp
                        & (jnp.arange(k) < i))) & (top_scores[i] > 0)),
        keep)
    return order, keep
