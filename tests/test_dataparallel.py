"""Batch-data-parallel YOLO inference (parallel/dataparallel.py): the
image batch axis sharded over a device mesh must give exactly the
single-device results — including indivisible batch sizes (padding) and
the BatchPipeline / MetDetPhoto --data-parallel integration."""

import numpy as np
import pytest

import jax


def _model():
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.models.yolo import YOLOModel
    return YOLOModel(weight_path="weights/yolov5s_v5.flax.npz",
                     dtype="float32", nms=True, warmup=False,
                     multiscale_pred=1, multiscale_partition=2,
                     logger=get_default_logger(), input_hw=(320, 320))


def _imgs(n: int) -> np.ndarray:
    from metdetpy_tpu.synth import _draw_gaussian_dot
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n):
        img = np.full((180, 320), 12.0, np.float32)
        x1, y1 = rng.uniform(40, 100), rng.uniform(20, 60)
        for k in range(140):
            a = k / 139
            _draw_gaussian_dot(img, x1 + 80 * a, y1 + 50 * a,
                               190 * (1 - 0.3 * a), 1.5)
        out.append(np.repeat(
            np.clip(img, 0, 255).astype(np.uint8)[..., None], 3, -1))
    return np.stack(out)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_batch_matches_single_device():
    from metdetpy_tpu.models.pipeline import BatchPipeline
    from metdetpy_tpu.parallel.dataparallel import (batch_sharding,
                                                    put_batch_sharded)
    m = _model()
    sharding = batch_sharding(8)

    # n=5 is NOT divisible by 8: exercises the padding path end-to-end
    for n in (8, 5):
        imgs = _imgs(n)
        single = m.forward_batch(imgs)
        dev, n_real = put_batch_sharded(imgs, sharding)
        assert n_real == n and dev.shape[0] % 8 == 0
        sharded = m.forward_batch_device(dev)[:n]
        assert any(len(pos) for pos, _ in sharded)
        for (pos_s, cls_s), (pos_1, cls_1) in zip(sharded, single):
            np.testing.assert_array_equal(pos_s, pos_1)
            np.testing.assert_allclose(cls_s, cls_1, rtol=1e-6)

    # BatchPipeline with sharding: tags trim the padded rows
    pipe = BatchPipeline(m, inflight=0, sharding=sharding)
    imgs = _imgs(5)
    done = pipe.submit(list(range(5)), imgs)
    assert [t for t, _ in done] == list(range(5))
    single = m.forward_batch(imgs)
    for (_, (pos_p, cls_p)), (pos_1, cls_1) in zip(done, single):
        np.testing.assert_array_equal(pos_p, pos_1)
        np.testing.assert_allclose(cls_p, cls_1, rtol=1e-6)
