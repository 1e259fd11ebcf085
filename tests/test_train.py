"""YOLO training-path tests: loss decreases on a fixed synthetic batch and
the sharded train step runs on the 8-device mesh."""

import numpy as np
import pytest

from metdetpy_tpu.models import train, yolov5

HW = (96, 96)
NC = 8


def test_loss_decreases_on_fixed_batch():
    import jax.numpy as jnp
    import optax
    model = yolov5.YOLOv5(nc=NC)
    _, variables = yolov5.init_params(nc=NC, input_hw=HW, seed=0)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])
    step = train.make_train_step(model, tx, NC)
    rng = np.random.default_rng(0)
    imgs, targets = train.synth_batch(rng, 2, HW, NC)
    imgs = jnp.asarray(imgs)
    losses = []
    for _ in range(8):
        variables, opt_state, loss = step(variables, opt_state, imgs,
                                          targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_dense_target_assignment():
    boxes = [np.array([[10, 10, 40, 30]], np.float32)]
    labels = [np.array([0], np.int32)]
    targets = train.build_dense_targets(boxes, labels, HW, NC)
    assert len(targets) == 3
    total_assigned = sum(float(m.sum()) for _, m in targets)
    assert total_assigned >= 1
    # the P3 head cell containing the center (25, 20) -> grid (3, 2) at /8
    tgt, mask = targets[0]
    if mask.sum() > 0:
        ys, xs = np.nonzero(mask[0].max(axis=-1))
        assert (2 in ys) and (3 in xs)


def test_sharded_train_step_on_mesh():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("dp", "mdl"))
    model = yolov5.YOLOv5(nc=NC)
    _, variables = yolov5.init_params(nc=NC, input_hw=HW, seed=0)
    tx = optax.sgd(1e-3)
    step, shard_vars, place_batch = train.make_sharded_train_step(
        model, tx, NC, mesh)
    variables, _ = shard_vars(variables)
    opt_state = tx.init(variables["params"])
    rng = np.random.default_rng(0)
    imgs, targets = train.synth_batch(rng, 4, HW, NC)
    imgs, targets = place_batch(jnp.asarray(imgs), targets)
    variables, opt_state, loss = step(variables, opt_state, imgs, targets)
    assert np.isfinite(float(loss))

def test_synth_batch_gaussian_streak_domain():
    """synth_batch must render gaussian-PSF streaks (deployment domain),
    with boxes tightly bounding bright pixels."""
    rng = np.random.default_rng(3)
    found = False
    for _ in range(8):
        imgs, _ = train.synth_batch(rng, 1, HW, NC)
        img = imgs[0, :, :, 0] * 255
        if img.max() > 100:
            found = True
            break
    assert found, "no bright streak/star rendered in 8 draws"
    # gaussian rendering: brightest pixel has non-binary neighbors (soft
    # falloff), unlike a hard cv2.line stroke on a dark bg
    y, x = np.unravel_index(np.argmax(img), img.shape)
    if 2 <= y < HW[0] - 2 and 2 <= x < HW[1] - 2:
        patch = img[y - 2:y + 3, x - 2:x + 3]
        mids = (patch > 0.15 * img.max()) & (patch < 0.85 * img.max())
        assert mids.sum() >= 2, "no soft gaussian falloff around the peak"
