"""Multi-stream dldet (parallel/multistream_dldet.py): S color streams,
MLDetector each, sharded over an 8-device mesh — per-stream results must
exactly equal a sequential MLDetector run on each stream."""

import numpy as np
import pytest

import jax


def _stream_blocks(n_streams: int, t: int) -> np.ndarray:
    """[S, T, 180, 320, 3] uint8: every stream gets a bright streak in a
    different frame window, over its own noise floor."""
    from metdetpy_tpu.synth import _draw_gaussian_dot
    rng = np.random.default_rng(13)
    out = np.empty((n_streams, t, 180, 320, 3), np.uint8)
    for s in range(n_streams):
        base = rng.integers(5, 20, (180, 320)).astype(np.float32)
        for tt in range(t):
            img = base.copy()
            if tt == (s % t):  # the streak frame differs per stream
                x1, y1 = 50.0 + 3 * s, 35.0 + 2 * s
                for k in range(150):
                    a = k / 149
                    _draw_gaussian_dot(img, x1 + 75 * a, y1 + 52 * a,
                                       200 * (1 - 0.3 * a), 1.5)
            out[s, tt] = np.repeat(
                np.clip(img, 0, 255).astype(np.uint8)[..., None], 3, -1)
    return out


def _dl_cfg():
    from metdetpy_tpu.structs import DLCfg
    return DLCfg.from_dict({"model": {
        "name": "YOLOModel", "weight_path": "weights/yolov5s_v5.flax.npz",
        "dtype": "float32", "nms": True, "warmup": False, "pos_thre": 0.25,
        "nms_thre": 0.45, "multiscale_pred": 0, "multiscale_partition": 2,
        "input_hw": "320x320"}})


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_multistream_dldet_matches_sequential():
    from metdetpy_tpu.detectors.mldet import MLDetector
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.parallel.mesh import build_mesh
    from metdetpy_tpu.parallel.multistream_dldet import \
        MultiStreamMLDetector

    logger = get_default_logger()
    cfg = _dl_cfg()
    blocks = _stream_blocks(8, 4)
    mesh = build_mesh(8, axis_name="stream")
    ms = MultiStreamMLDetector(8, window_sec=1.0, fps=2.0,
                               mask=np.ones((180, 320, 3), np.uint8),
                               num_cls=9, cfg=cfg, logger=logger,
                               mesh=mesh)
    per_stream = ms.process_blocks(blocks)
    # second block group: the per-stream history carry must persist
    per_stream2 = ms.process_blocks(blocks[:, ::-1])

    n_hits = 0
    for s in range(8):
        seq = MLDetector(window_sec=1.0, fps=2.0,
                         mask=np.ones((180, 320, 3), np.uint8),
                         num_cls=9, cfg=cfg, logger=logger)
        seq.model = ms.model  # share weights
        ref1 = seq.process_block(blocks[s])
        ref2 = seq.process_block(blocks[s, ::-1])
        for (pos_m, cls_m), (pos_r, cls_r) in zip(
                per_stream[s] + per_stream2[s], ref1 + ref2):
            n_hits += len(pos_m) > 0
            np.testing.assert_array_equal(pos_m, pos_r)
            np.testing.assert_allclose(cls_m, cls_r, rtol=1e-6)
    assert n_hits > 0, "no stream detected its streak"
