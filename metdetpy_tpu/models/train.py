"""YOLOv5s training: loss, target assignment, sharded train step.

The reference consumes pretrained ONNX weights that are Git-LFS pointers
absent from this mount (SURVEY.md §6), so this framework includes the
training path needed to (re)produce weights: a YOLOv5-style loss (BCE
objectness + BCE class + box regression on the decoded parameterization),
a host-side anchor assigner building dense per-head targets, and a train
step shardable over a (dp, mdl) mesh -- batch data-parallel, parameters
sharded over output channels (GSPMD inserts the collectives).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import yolov5

ANCHOR_T = 4.0  # wh-ratio matching threshold (ultralytics default)


# ---------------------------------------------------------------------------
# Target assignment (host, numpy)
# ---------------------------------------------------------------------------


def build_dense_targets(boxes_list: Sequence[np.ndarray],
                        labels_list: Sequence[np.ndarray],
                        input_hw: tuple[int, int], nc: int,
                        anchors=yolov5.DEFAULT_ANCHORS,
                        strides=yolov5.STRIDES):
    """Build dense per-head targets from per-image xyxy boxes + labels.

    Returns a list over heads of (tgt [B,h,w,3,5+nc], mask [B,h,w,3]):
    a GT is assigned to every anchor whose w/h ratio to the GT box is
    within ANCHOR_T at the grid cell containing the box center.
    """
    b = len(boxes_list)
    out = []
    for anc, stride in zip(anchors, strides):
        gh, gw = input_hw[0] // stride, input_hw[1] // stride
        tgt = np.zeros((b, gh, gw, 3, 5 + nc), np.float32)
        mask = np.zeros((b, gh, gw, 3), np.float32)
        for bi, (boxes, labels) in enumerate(zip(boxes_list, labels_list)):
            for box, label in zip(boxes, labels):
                x1, y1, x2, y2 = [float(v) for v in box]
                cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
                w, h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
                gx, gy = int(cx / stride), int(cy / stride)
                if not (0 <= gx < gw and 0 <= gy < gh):
                    continue
                for ai, (aw, ah) in enumerate(anc):
                    r = max(w / aw, aw / w, h / ah, ah / h)
                    if r > ANCHOR_T:
                        continue
                    tgt[bi, gy, gx, ai, 0:4] = (cx, cy, w, h)
                    tgt[bi, gy, gx, ai, 4] = 1.0
                    tgt[bi, gy, gx, ai, 5 + int(label)] = 1.0
                    mask[bi, gy, gx, ai] = 1.0
        out.append((tgt, mask))
    return out


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def _bce(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels)


def yolo_loss(heads: Sequence[jax.Array], targets, nc: int,
              anchors=yolov5.DEFAULT_ANCHORS, strides=yolov5.STRIDES,
              box_w: float = 0.05, obj_w: float = 1.0, cls_w: float = 0.5):
    """YOLOv5-style loss over raw head outputs and dense targets."""
    total = 0.0
    for head, (tgt, mask), anc, stride in zip(heads, targets, anchors,
                                              strides):
        b, gh, gw, _ = head.shape
        p = head.reshape(b, gh, gw, 3, 5 + nc)
        # decode boxes with the v5 parameterization
        sig = jax.nn.sigmoid(p[..., 0:4])
        gx = jnp.arange(gw, dtype=jnp.float32)[None, None, :, None]
        gy = jnp.arange(gh, dtype=jnp.float32)[None, :, None, None]
        anc_arr = jnp.asarray(anc, jnp.float32)
        px = (sig[..., 0] * 2 - 0.5 + gx) * stride
        py = (sig[..., 1] * 2 - 0.5 + gy) * stride
        pw = jnp.square(sig[..., 2] * 2) * anc_arr[None, None, None, :, 0]
        ph = jnp.square(sig[..., 3] * 2) * anc_arr[None, None, None, :, 1]
        # box regression: normalized squared error (a CIoU-lite surrogate)
        scale = jnp.float32(stride * 8)
        box_err = (jnp.square((px - tgt[..., 0]) / scale)
                   + jnp.square((py - tgt[..., 1]) / scale)
                   + jnp.square((pw - tgt[..., 2]) / scale)
                   + jnp.square((ph - tgt[..., 3]) / scale))
        n_pos = jnp.maximum(jnp.sum(mask), 1.0)
        box_loss = jnp.sum(box_err * mask) / n_pos
        obj_loss = jnp.mean(_bce(p[..., 4], tgt[..., 4]))
        cls_loss = (jnp.sum(_bce(p[..., 5:], tgt[..., 5:])
                            * mask[..., None]) / (n_pos * nc))
        total = total + box_w * box_loss + obj_w * obj_loss + cls_w * cls_loss
    return total


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


def make_train_step(model: yolov5.YOLOv5, tx: optax.GradientTransformation,
                    nc: int):
    """Unsharded jitted train step: (variables, opt_state, imgs, targets) ->
    (variables, opt_state, loss)."""

    def loss_fn(params, batch_stats, imgs, targets):
        heads = model.apply({"params": params, "batch_stats": batch_stats},
                            imgs)
        return yolo_loss(heads, targets, nc)

    @jax.jit
    def step(variables, opt_state, imgs, targets):
        params, batch_stats = variables["params"], variables["batch_stats"]
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_stats, imgs,
                                                  targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, "batch_stats": batch_stats}, opt_state, loss

    return step


def param_sharding_rules(params: Any, mesh: Mesh,
                         axis: str = "mdl") -> Any:
    """Shard conv kernels over output channels where divisible; replicate
    the rest (tensor-parallel layout; GSPMD adds the collectives)."""
    size = mesh.shape[axis]

    def rule(leaf):
        if leaf.ndim >= 1 and leaf.shape[-1] % size == 0 and leaf.ndim >= 2:
            spec = (None,) * (leaf.ndim - 1) + (axis,)
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def make_sharded_train_step(model: yolov5.YOLOv5,
                            tx: optax.GradientTransformation, nc: int,
                            mesh: Mesh, dp_axis: str = "dp",
                            mdl_axis: str = "mdl"):
    """Train step jitted over a (dp, mdl) mesh: batch over dp, conv output
    channels over mdl. Returns (step, shard_variables) where
    shard_variables places a variable tree onto the mesh."""

    def loss_fn(params, batch_stats, imgs, targets):
        heads = model.apply({"params": params, "batch_stats": batch_stats},
                            imgs)
        return yolo_loss(heads, targets, nc)

    data_sharding = NamedSharding(mesh, P(dp_axis))

    def shard_variables(variables):
        shardings = {
            "params": param_sharding_rules(variables["params"], mesh,
                                           mdl_axis),
            "batch_stats": param_sharding_rules(variables["batch_stats"],
                                                mesh, mdl_axis),
        }
        return jax.device_put(variables, shardings), shardings

    @jax.jit
    def step(variables, opt_state, imgs, targets):
        params, batch_stats = variables["params"], variables["batch_stats"]
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_stats, imgs,
                                                  targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, "batch_stats": batch_stats}, opt_state, loss

    def place_batch(imgs, targets):
        imgs = jax.device_put(imgs, data_sharding)
        targets = [(jax.device_put(t, data_sharding),
                    jax.device_put(m, data_sharding)) for t, m in targets]
        return imgs, targets

    return step, shard_variables, place_batch


# ---------------------------------------------------------------------------
# Synthetic training data + fit loop
# ---------------------------------------------------------------------------


def _draw_streak(img: np.ndarray, x1, y1, x2, y2, amp, sigma) -> None:
    """Gaussian streak -- matches the appearance of a max-stacked meteor
    from the synthetic video renderer (synth._draw_gaussian_dot trail)."""
    from ..synth import _draw_gaussian_dot
    steps = max(int(np.hypot(x2 - x1, y2 - y1)) * 2, 2)
    for k in range(steps):
        a = k / (steps - 1)
        # slight brightness falloff along the trail
        _draw_gaussian_dot(img, x1 + (x2 - x1) * a, y1 + (y2 - y1) * a,
                           amp * (1.0 - 0.3 * a), sigma)


def synth_batch(rng: np.random.Generator, batch: int,
                input_hw: tuple[int, int], nc: int):
    """Random star-field images with gaussian meteor streaks + labels
    (same renderer family as synth.generate_meteor_video, so trained
    weights transfer to stacks of the synthetic fixtures)."""
    from ..synth import _draw_gaussian_dot
    h, w = input_hw
    imgs = np.zeros((batch, h, w, 3), np.float32)
    boxes_list, labels_list = [], []
    for b in range(batch):
        img = np.full((h, w), 12.0, np.float32)
        for _ in range(rng.integers(5, 25)):
            # stars are hard negatives: include saturated ones so bright
            # dots in max-stacks don't read as meteors
            _draw_gaussian_dot(img, rng.uniform(0, w), rng.uniform(0, h),
                               rng.uniform(25, 250), rng.uniform(0.7, 1.8))
        boxes, labels = [], []
        for _ in range(rng.integers(0, 3)):
            length = rng.uniform(15, 110)
            ang = rng.uniform(0, 2 * np.pi)
            x1 = rng.uniform(5, w - 5)
            y1 = rng.uniform(5, h - 5)
            x2 = np.clip(x1 + length * np.cos(ang), 0, w - 1)
            y2 = np.clip(y1 + length * np.sin(ang), 0, h - 1)
            if max(abs(x2 - x1), abs(y2 - y1)) < 10:
                continue
            _draw_streak(img, x1, y1, x2, y2, rng.uniform(120, 240),
                         rng.uniform(1.0, 2.2))
            boxes.append([min(x1, x2), min(y1, y2), max(x1, x2),
                          max(y1, y2)])
            labels.append(0)  # METEOR
        # half the batch simulates a max-stack: noise floor is the max of
        # several per-frame noise draws (brighter, positively skewed)
        if rng.random() < 0.5:
            img = img + rng.normal(0, rng.uniform(2, 5),
                                   (4, h, w)).max(axis=0)
        else:
            img = img + rng.normal(0, rng.uniform(2, 5), (h, w))
        # quantize like the deployed uint8 pipeline; occasionally blur to
        # mimic codec smoothing of the noise texture
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        if rng.random() < 0.3:
            import cv2
            u8 = cv2.GaussianBlur(u8, (3, 3), 0.6)
        imgs[b] = np.repeat(u8[..., None], 3, axis=-1) / 255.0
        boxes_list.append(np.asarray(boxes, np.float32).reshape(-1, 4))
        labels_list.append(np.asarray(labels, np.int32))
    targets = build_dense_targets(boxes_list, labels_list, input_hw, nc)
    return imgs, targets


def fit_synthetic(steps: int = 200, batch: int = 8,
                  input_hw: tuple[int, int] = (320, 320), nc: int = 8,
                  lr: float = 1e-3, seed: int = 0, log_every: int = 20,
                  variables=None, logger=None):
    """Train YOLOv5s on synthetic meteor scenes; returns the best-loss
    variables (global-norm clipping + cosine decay guard against the
    predict-nothing collapse that a late loss spike can cause)."""
    model = yolov5.YOLOv5(nc=nc)
    if variables is None:
        _, variables = yolov5.init_params(nc=nc, input_hw=input_hw,
                                          seed=seed)
    schedule = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(schedule))
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx, nc)
    rng = np.random.default_rng(seed)
    loss_ema, best_ema = None, None
    best_variables = variables
    for i in range(steps):
        imgs, targets = synth_batch(rng, batch, input_hw, nc)
        variables, opt_state, loss = step(variables, opt_state,
                                          jnp.asarray(imgs), targets)
        loss_f = float(loss)
        loss_ema = loss_f if loss_ema is None else (0.9 * loss_ema
                                                    + 0.1 * loss_f)
        if i >= steps // 4 and i % 25 == 0 and (best_ema is None
                                                or loss_ema < best_ema):
            best_ema = loss_ema
            best_variables = jax.device_get(variables)
        if logger is not None and i % log_every == 0:
            logger.info(f"train step {i}: loss={loss_f:.4f} "
                        f"(ema {loss_ema:.4f})")
    if best_ema is not None and loss_ema > best_ema * 1.5:
        if logger is not None:
            logger.info(f"restoring best checkpoint (ema {best_ema:.4f} vs "
                        f"final {loss_ema:.4f})")
        return best_variables
    return variables
