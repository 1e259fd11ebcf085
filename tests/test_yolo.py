"""Flax YOLOv5s tests: architecture shapes, decode, NMS, multiscale tiling
and the weight round-trip. Random weights (upstream ships only LFS
pointers); these validate pipeline mechanics, not detection quality."""

import numpy as np
import pytest

from metdetpy_tpu.models import yolov5
from metdetpy_tpu.models.weights import (flatten_tree, load_params,
                                         save_params, unflatten_tree)

HW = (128, 128)  # small input for CPU test speed


@pytest.fixture(scope="module")
def model_vars():
    return yolov5.init_params(nc=8, input_hw=HW, seed=0)


def test_head_shapes(model_vars):
    import jax.numpy as jnp
    model, variables = model_vars
    x = jnp.zeros((2, HW[0], HW[1], 3), jnp.float32)
    heads = model.apply(variables, x)
    assert len(heads) == 3
    for head, stride in zip(heads, yolov5.STRIDES):
        b, h, w, c = head.shape
        assert (b, h, w) == (2, HW[0] // stride, HW[1] // stride)
        assert c == 3 * (5 + 8)


def test_decode_shapes_and_ranges(model_vars):
    import jax.numpy as jnp
    model, variables = model_vars
    x = jnp.zeros((1, HW[0], HW[1], 3), jnp.float32)
    heads = model.apply(variables, x)
    pred = yolov5.decode_predictions(heads, nc=8)
    n_expected = sum((HW[0] // s) * (HW[1] // s) * 3 for s in yolov5.STRIDES)
    assert pred.shape == (1, n_expected, 13)
    pred = np.asarray(pred)
    # obj/cls scores are sigmoids
    assert np.all(pred[..., 4:] >= 0) and np.all(pred[..., 4:] <= 1)
    # xy centers lie within (pad of one stride around) the image
    assert np.all(pred[..., 0] > -40) and np.all(pred[..., 0] < HW[1] + 40)


def test_param_count_matches_yolov5s(model_vars):
    _, variables = model_vars
    n_params = sum(int(np.prod(v.shape))
                   for v in flatten_tree(variables["params"]).values())
    # yolov5s has ~7.2M params; ours differs only by the head class count
    assert 6.5e6 < n_params < 8.0e6, n_params


def test_weights_roundtrip(tmp_path, model_vars):
    _, variables = model_vars
    path = str(tmp_path / "w.npz")
    save_params(variables, path)
    loaded = load_params(path)
    flat_a = flatten_tree(variables)
    flat_b = flatten_tree(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def _ultralytics_sd_from_flat(flat):
    """Invert the ultralytics->Flax mapping: Flax leaves -> a torch-layout
    state dict with model.N.* names (used to synthesize conversion
    fixtures without the absent upstream weights)."""
    inv_layer = {v: k for k, v in
                 __import__("metdetpy_tpu.models.weights",
                            fromlist=["_LAYER_MAP"])._LAYER_MAP.items()}
    sd = {}
    for key, val in flat.items():
        parts = key.split("/")
        mod = parts[1]
        if mod.startswith("detect"):
            i = int(mod[-1])
            if parts[-1] == "kernel":
                sd[f"model.24.m.{i}.weight"] = val.transpose(3, 2, 0, 1)
            else:
                sd[f"model.24.m.{i}.bias"] = val
            continue
        layer = inv_layer[mod]
        torch_mod = f"model.{layer}"
        for p in parts[2:-2]:
            torch_mod += "." + (f"m.{p[1:]}" if p.startswith("m") and
                                p[1:].isdigit() else p)
        unit, leaf = parts[-2], parts[-1]
        if unit == "conv" and leaf == "kernel":
            sd[f"{torch_mod}.conv.weight"] = val.transpose(3, 2, 0, 1)
        elif unit == "bn":
            name = {"scale": "weight", "bias": "bias", "mean":
                    "running_mean", "var": "running_var"}[leaf]
            sd[f"{torch_mod}.bn.{name}"] = val
    return sd


def test_convert_state_dict_roundtrip(model_vars):
    """Invert the ultralytics->Flax mapping on our own random init, convert
    it back, and require exact round-trip equality -- validates the
    converter against the real module tree without needing the (absent)
    upstream weights."""
    from metdetpy_tpu.models.weights import convert_state_dict
    _, variables = model_vars
    flat = flatten_tree(variables)
    sd = _ultralytics_sd_from_flat(flat)
    converted = convert_state_dict(sd)
    flat2 = flatten_tree(converted)
    assert set(flat2) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat[k]), flat2[k], err_msg=k)


# --- minimal ONNX protobuf writer (test fixture side of the wire parser) --

def _pb_varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_field(num: int, wt: int, payload) -> bytes:
    key = _pb_varint((num << 3) | wt)
    if wt == 2:
        return key + _pb_varint(len(payload)) + payload
    return key + _pb_varint(payload)


def _onnx_bytes(sd: dict) -> bytes:
    """Serialize {name: float32 array} as a valid ONNX ModelProto holding
    them as graph initializers (raw_data encoding, like torch.onnx)."""
    inits = b""
    for name, arr in sd.items():
        arr = np.ascontiguousarray(arr, np.float32)
        t = b""
        for d in arr.shape:
            t += _pb_field(1, 0, d)                      # dims
        t += _pb_field(2, 0, 1)                          # data_type FLOAT
        t += _pb_field(8, 2, name.encode())              # name
        t += _pb_field(9, 2, arr.tobytes())              # raw_data
        inits += _pb_field(5, 2, t)                      # initializer
    graph = inits + _pb_field(2, 2, b"g")                # graph name
    model = _pb_field(1, 0, 7)                           # ir_version
    model += _pb_field(7, 2, graph)                      # graph
    return model


def test_onnx_wire_parser_roundtrip(tmp_path):
    """parse_onnx_initializers must read back exactly what the protobuf
    fixture writer put in (names, shapes, values)."""
    from metdetpy_tpu.models.weights import parse_onnx_initializers
    rng = np.random.default_rng(0)
    sd = {"model.0.conv.weight": rng.normal(size=(8, 3, 3, 3)).astype(
              np.float32),
          "model.0.bn.weight": rng.normal(size=(8,)).astype(np.float32),
          "scalar": np.float32(3.5).reshape(())}
    path = str(tmp_path / "tiny.onnx")
    with open(path, "wb") as f:
        f.write(_onnx_bytes(sd))
    parsed = parse_onnx_initializers(path)
    assert set(parsed) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(parsed[k], sd[k], err_msg=k)


def test_convert_onnx_full_model(tmp_path, model_vars):
    """End-to-end ONNX conversion without the onnx package: serialize a
    full ultralytics-layout state dict into a real ONNX file and require
    convert_onnx to reproduce the original Flax tree exactly."""
    from metdetpy_tpu.models.weights import convert_onnx
    _, variables = model_vars
    flat = flatten_tree(variables)
    sd = _ultralytics_sd_from_flat(flat)
    path = str(tmp_path / "yolov5s_synth.onnx")
    with open(path, "wb") as f:
        f.write(_onnx_bytes(sd))
    converted = convert_onnx(path)
    flat2 = flatten_tree(converted)
    assert set(flat2) == set(flat)
    for k in flat:
        np.testing.assert_allclose(np.asarray(flat[k]), flat2[k], rtol=1e-6,
                                   err_msg=k)


def test_onnx_parser_on_torch_export(tmp_path):
    """Parse an ONNX file produced by the real torch exporter (if the
    legacy exporter works without the onnx wheel in this image)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    m = nn.Conv2d(3, 4, 3, padding=1, bias=True)
    path = str(tmp_path / "conv.onnx")
    try:
        torch.onnx.export(m, torch.zeros(1, 3, 8, 8), path,
                          opset_version=12, dynamo=False)
    except Exception as e:
        pytest.skip(f"torch.onnx.export unavailable here: {e!r}")
    from metdetpy_tpu.models.weights import parse_onnx_initializers
    parsed = parse_onnx_initializers(path)
    weights = {k: v for k, v in parsed.items() if v.size == 4 * 3 * 3 * 3}
    assert weights, f"no conv weight found among {list(parsed)}"
    w = next(iter(weights.values()))
    np.testing.assert_allclose(w.reshape(4, 3, 3, 3),
                               m.weight.detach().numpy(), rtol=1e-6)


def test_nms_device_semantics():
    import jax.numpy as jnp
    from metdetpy_tpu.ops.nms import nms_xyxy
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                         [0, 0, 9, 9]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.2], jnp.float32)
    order, keep = nms_xyxy(boxes, scores, score_thre=0.3, nms_thre=0.45)
    kept = np.asarray(order)[np.asarray(keep)]
    assert 0 in kept and 2 in kept       # top box + distant box survive
    assert 1 not in kept and 3 not in kept  # overlapped / low-score removed


def test_yolomodel_forward_multiscale(tmp_path):
    """End-to-end YOLOModel.forward on a random image exercises the tiled
    batched inference path and output shapes."""
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.models.yolo import YOLOModel
    model = YOLOModel(weight_path=str(tmp_path / "missing.npz"),
                      nms=True, warmup=False, multiscale_pred=1,
                      multiscale_partition=2, logger=BaseMetLog(),
                      input_hw=HW)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 320, 3), np.uint8)
    boxes, cls = model.forward(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert cls.shape[0] == boxes.shape[0] and cls.shape[1] == 8
    # boxes are in input-image coordinates
    if len(boxes):
        assert boxes[:, [0, 2]].max() <= 320 + 64
        assert boxes[:, [1, 3]].max() <= 200 + 64

def test_postprocess_drops_degenerate_boxes():
    """Sub-pixel (zero-width/height after int cast) boxes must be filtered
    out before they reach box_matching in the recheck stage."""
    from metdetpy_tpu.models.yolo import YOLOModel
    m = YOLOModel.__new__(YOLOModel)
    m.nms = False
    m.pos_thre = 0.25
    m.nms_thre = 0.45
    # xywh+obj+cls rows: one normal box, one with w<1, one with h<1
    pred = np.array([
        [50, 50, 20, 10, 0.9, 0.8, 0.1],
        [80.4, 80, 0.2, 10, 0.9, 0.8, 0.1],   # int-truncates to x1==x2
        [30, 30.4, 10, 0.2, 0.9, 0.8, 0.1],   # int-truncates to y1==y2
    ], np.float32)
    pos, cls = m._postprocess_single(pred, (1.0, 1.0))
    assert len(pos) == 1 and len(cls) == 1
    assert pos[0][2] - pos[0][0] >= 1 and pos[0][3] - pos[0][1] >= 1


def test_generate_meteor_video_empty_meteor_list():
    from metdetpy_tpu.synth import generate_meteor_video
    frames = generate_meteor_video(width=64, height=48, fps=10.0,
                                   duration_sec=0.5, meteors=[], n_stars=5)
    assert frames.shape == (5, 48, 64)

def test_forward_batch_matches_forward():
    """forward_batch must find the same objects as per-image forward()
    (box sets may differ in which duplicate-cluster member survives, so
    compare by IoU matching of the top detections)."""
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.models.yolo import YOLOModel
    from metdetpy_tpu.synth import _draw_gaussian_dot
    from metdetpy_tpu.utils import box_matching
    rng = np.random.default_rng(5)
    imgs = []
    for _ in range(3):
        img = np.full((180, 320), 12.0, np.float32)
        for _ in range(15):
            _draw_gaussian_dot(img, rng.uniform(0, 320), rng.uniform(0, 180),
                               rng.uniform(25, 200), rng.uniform(0.8, 1.5))
        x1, y1 = rng.uniform(40, 120), rng.uniform(30, 80)
        for k in range(160):
            a = k / 159
            _draw_gaussian_dot(img, x1 + 70 * a, y1 + 55 * a,
                               200 * (1 - 0.3 * a), 1.5)
        imgs.append(np.repeat(np.clip(img, 0, 255).astype(np.uint8)[..., None],
                              3, -1))
    imgs = np.stack(imgs)
    m = YOLOModel(weight_path="weights/yolov5s_v5.flax.npz", dtype="float32",
                  nms=True, warmup=False, multiscale_pred=1,
                  multiscale_partition=2, logger=get_default_logger(),
                  input_hw=(320, 320))
    batch = m.forward_batch(imgs)
    for k in range(3):
        pos_s, _ = m.forward(imgs[k])
        pos_b, _ = batch[k]
        assert (len(pos_b) > 0) == (len(pos_s) > 0)
        if len(pos_s):
            # the single-path top box must be matched by some batch box
            assert box_matching([list(map(int, pos_s[0]))],
                                [list(map(int, p)) for p in pos_b])


def test_forward_batch_topk_readback_exact(tmp_path):
    """The device-compacted top-k readback must give exactly the same
    forward_batch results as reading back every anchor row: rows beyond
    the top-k are sub-threshold and the host drops them anyway, and both
    paths present candidates in descending-objectness order."""
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.models.yolo import YOLOModel
    from metdetpy_tpu.synth import _draw_gaussian_dot
    rng = np.random.default_rng(11)
    img = np.full((180, 320), 12.0, np.float32)
    x1, y1 = 60.0, 40.0
    for k in range(160):
        a = k / 159
        _draw_gaussian_dot(img, x1 + 70 * a, y1 + 55 * a,
                           200 * (1 - 0.3 * a), 1.5)
    imgs = np.stack([np.repeat(np.clip(img, 0, 255)
                               .astype(np.uint8)[..., None], 3, -1)] * 2)
    m = YOLOModel(weight_path="weights/yolov5s_v5.flax.npz",
                  dtype="float32", nms=True, warmup=False,
                  multiscale_pred=1, multiscale_partition=2,
                  logger=get_default_logger(), input_hw=(320, 320))
    compact = m.forward_batch(imgs)
    m.topk_readback = 10 ** 9  # clamped to every anchor row
    full = m.forward_batch(imgs)
    for (pos_c, cls_c), (pos_f, cls_f) in zip(compact, full):
        np.testing.assert_array_equal(pos_c, pos_f)
        np.testing.assert_allclose(cls_c, cls_f, rtol=1e-6)


def _streak_test_imgs(portrait: bool = False) -> np.ndarray:
    from metdetpy_tpu.synth import _draw_gaussian_dot
    img = np.full((180, 320), 12.0, np.float32)
    x1, y1 = 60.0, 40.0
    for k in range(160):
        a = k / 159
        _draw_gaussian_dot(img, x1 + 70 * a, y1 + 55 * a,
                           200 * (1 - 0.3 * a), 1.5)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if portrait:
        img = img.T
    return np.stack([np.repeat(img[..., None], 3, -1)] * 2)


def test_forward_batch_device_matches_host():
    """forward_batch_device (stacks stay in HBM; tiling/normalize/resize/
    forward/top-k fused on device) must reproduce the host-crop
    forward_batch exactly: multiscale tiled path, transpose path, and the
    single-scale (multiscale_pred=0) batched-NMS path."""
    import jax.numpy as jnp

    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.models.yolo import YOLOModel
    m = YOLOModel(weight_path="weights/yolov5s_v5.flax.npz",
                  dtype="float32", nms=True, warmup=False,
                  multiscale_pred=1, multiscale_partition=2,
                  logger=get_default_logger(), input_hw=(320, 320))

    def check(model, imgs):
        host = model.forward_batch(imgs)
        dev = model.forward_batch_device(jnp.asarray(imgs))
        assert len(host) == len(dev)
        for (pos_h, cls_h), (pos_d, cls_d) in zip(host, dev):
            np.testing.assert_array_equal(pos_h, pos_d)
            np.testing.assert_allclose(cls_h, cls_d, rtol=1e-6)

    imgs = _streak_test_imgs()
    check(m, imgs)                              # landscape: w_rep tiling
    check(m, _streak_test_imgs(portrait=True))  # h_rep tiling
    m.multiscale_pred = 0               # single-scale batched-NMS path
    check(m, imgs)
    # transpose_flag needs a non-square model ratio: portrait 320x180
    # imgs vs hw (320,160) -> (1.78-1)*(2-1) > 0 -> transposed tiling
    m2 = YOLOModel(weight_path="weights/yolov5s_v5.flax.npz",
                   dtype="float32", nms=True, warmup=False,
                   multiscale_pred=1, multiscale_partition=2,
                   logger=get_default_logger(), input_hw=(320, 160))
    assert m2._plan_tiles(320, 180)[0] is True
    check(m2, _streak_test_imgs(portrait=True))


def test_mldetector_device_stacks_match_host():
    """MLDetector.process_block on device-resident stacks (no full-stack
    readback) must equal the host-fetched forward_batch path, including
    the ROI-gradient box-diagonal orientation."""
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.detectors.mldet import MLDetector
    from metdetpy_tpu.structs import DLCfg

    class _HostOnly:
        """Proxy hiding BOTH device entry points (dispatch_batch_device
        gates process_block_async; forward_batch_device gates the sync
        fallback) so MLDetector truly falls back to the host-fetch
        forward_batch path."""

        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name in ("forward_batch_device", "dispatch_batch_device"):
                raise AttributeError(name)
            return getattr(self._inner, name)

    imgs = _streak_test_imgs()  # [2, 180, 320, 3] u8
    block = np.stack([imgs[0] // 4, imgs[0], imgs[0] // 2, imgs[1]])
    cfg = DLCfg.from_dict({"model": {
        "name": "YOLOModel", "weight_path": "weights/yolov5s_v5.flax.npz",
        "dtype": "float32", "nms": True, "warmup": False, "pos_thre": 0.25,
        "nms_thre": 0.45, "multiscale_pred": 1, "multiscale_partition": 2,
        "input_hw": "320x320"}})
    mask = np.ones((180, 320, 3), np.uint8)
    det = MLDetector(window_sec=1.0, fps=2.0, mask=mask, num_cls=9,
                     cfg=cfg, logger=get_default_logger())
    det_host = MLDetector(window_sec=1.0, fps=2.0, mask=mask, num_cls=9,
                          cfg=cfg, logger=get_default_logger())
    det_host.model = _HostOnly(det.model)  # same weights, host path
    out_dev = det.process_block(block.copy())
    out_host = det_host.process_block(block.copy())
    assert any(len(pos) for pos, _ in out_dev)  # the streak is detected
    for (pos_d, cls_d), (pos_h, cls_h) in zip(out_dev, out_host):
        np.testing.assert_array_equal(pos_d, pos_h)
        np.testing.assert_allclose(cls_d, cls_h, rtol=1e-6)


def test_mldetector_async_pipeline_matches_sync():
    """process_block_async/collect must pipeline: dispatching two blocks
    back-to-back BEFORE collecting either must equal the synchronous
    per-block path (the window-history carry advances at dispatch time,
    so in-flight blocks never see stale state)."""
    from metdetpy_tpu.detectors.mldet import MLDetector
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.structs import DLCfg

    imgs = _streak_test_imgs()
    block1 = np.stack([imgs[0] // 4, imgs[0], imgs[0] // 2, imgs[1]])
    block2 = np.stack([imgs[1], imgs[0] // 3, imgs[1] // 2, imgs[0]])
    cfg = DLCfg.from_dict({"model": {
        "name": "YOLOModel", "weight_path": "weights/yolov5s_v5.flax.npz",
        "dtype": "float32", "nms": True, "warmup": False, "pos_thre": 0.25,
        "nms_thre": 0.45, "multiscale_pred": 1, "multiscale_partition": 2,
        "input_hw": "320x320"}})
    mask = np.ones((180, 320, 3), np.uint8)
    det_async = MLDetector(window_sec=1.0, fps=2.0, mask=mask, num_cls=9,
                           cfg=cfg, logger=get_default_logger())
    det_sync = MLDetector(window_sec=1.0, fps=2.0, mask=mask, num_cls=9,
                          cfg=cfg, logger=get_default_logger())
    det_sync.model = det_async.model  # share weights
    h1 = det_async.process_block_async(block1)
    h2 = det_async.process_block_async(block2)  # pipelined dispatch
    out_async = det_async.collect(h1) + det_async.collect(h2)
    out_sync = (det_sync.process_block(block1)
                + det_sync.process_block(block2))
    assert any(len(pos) for pos, _ in out_async)
    for (pos_a, cls_a), (pos_s, cls_s) in zip(out_async, out_sync):
        np.testing.assert_array_equal(pos_a, pos_s)
        np.testing.assert_allclose(cls_a, cls_s, rtol=1e-6)


def test_mldetector_collect_many_matches_collect():
    """Deferred horizon collection (MLDetector.collect_many: grouped
    per-level stacked fetches) must equal per-block collect exactly,
    including across a group pad (2 handles, group size 8)."""
    from metdetpy_tpu.detectors.mldet import MLDetector
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.structs import DLCfg

    imgs = _streak_test_imgs()
    block1 = np.stack([imgs[0] // 4, imgs[0], imgs[0] // 2, imgs[1]])
    block2 = np.stack([imgs[1], imgs[0] // 3, imgs[1] // 2, imgs[0]])
    cfg = DLCfg.from_dict({"model": {
        "name": "YOLOModel", "weight_path": "weights/yolov5s_v5.flax.npz",
        "dtype": "float32", "nms": True, "warmup": False, "pos_thre": 0.25,
        "nms_thre": 0.45, "multiscale_pred": 1, "multiscale_partition": 2,
        "input_hw": "320x320"}})
    mask = np.ones((180, 320, 3), np.uint8)
    det_a = MLDetector(window_sec=1.0, fps=2.0, mask=mask, num_cls=9,
                       cfg=cfg, logger=get_default_logger())
    det_b = MLDetector(window_sec=1.0, fps=2.0, mask=mask, num_cls=9,
                       cfg=cfg, logger=get_default_logger())
    det_b.model = det_a.model  # share weights
    many = det_a.collect_many([det_a.process_block_async(block1),
                               det_a.process_block_async(block2)])
    ref = [det_b.collect(det_b.process_block_async(block1)),
           det_b.collect(det_b.process_block_async(block2))]
    assert any(len(pos) for blk in many for pos, _ in blk)
    for blk_m, blk_r in zip(many, ref):
        for (pos_m, cls_m), (pos_r, cls_r) in zip(blk_m, blk_r):
            np.testing.assert_array_equal(pos_m, pos_r)
            np.testing.assert_allclose(cls_m, cls_r, rtol=1e-6)


def test_batch_pipeline_matches_direct():
    """BatchPipeline (dispatch/collect overlap for the photo loops) must
    return exactly forward_batch's results, tagged, in submission order,
    lagging by at most the in-flight budget."""
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.models.pipeline import BatchPipeline
    from metdetpy_tpu.models.yolo import YOLOModel
    imgs = _streak_test_imgs()
    m = YOLOModel(weight_path="weights/yolov5s_v5.flax.npz",
                  dtype="float32", nms=True, warmup=False,
                  multiscale_pred=1, multiscale_partition=2,
                  logger=get_default_logger(), input_hw=(320, 320))
    direct = m.forward_batch(imgs)
    pipe = BatchPipeline(m, inflight=1)
    done = pipe.submit([("a", 0), ("a", 1)], imgs)
    assert done == []  # first batch stays in flight
    done += pipe.submit([("b", 0), ("b", 1)], imgs)
    assert [t for t, _ in done] == [("a", 0), ("a", 1)]
    done += pipe.drain()
    assert [t for t, _ in done] == [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
    for (_, (pos_p, cls_p)), (pos_d, cls_d) in zip(done, list(direct) * 2):
        np.testing.assert_array_equal(pos_p, pos_d)
        np.testing.assert_allclose(cls_p, cls_d, rtol=1e-6)
    # synchronous mode (visu): results return on the same submit
    sync = BatchPipeline(m, inflight=0)
    done0 = sync.submit([0, 1], imgs)
    assert [t for t, _ in done0] == [0, 1] and not sync.drain()
    # 2-D batches (photo folders load IMREAD_UNCHANGED, so grayscale
    # images arrive without a channel axis) must match forward_batch
    # through the device dispatch path too
    gray = imgs[..., 0]
    direct_g = m.forward_batch(gray)
    done_g = BatchPipeline(m, inflight=0).submit([0, 1], gray)
    for (_, (pos_p, cls_p)), (pos_d, cls_d) in zip(done_g, direct_g):
        np.testing.assert_array_equal(pos_p, pos_d)
        np.testing.assert_allclose(cls_p, cls_d, rtol=1e-6)


def test_mldetector_reset_device_state():
    """Device-fault recovery drops the window-history carry (api.py's
    block loop calls this after a transient device failure)."""
    import jax.numpy as jnp

    from metdetpy_tpu.detectors.mldet import MLDetector
    from metdetpy_tpu.log import get_default_logger
    from metdetpy_tpu.structs import DLCfg
    cfg = DLCfg.from_dict({"model": {
        "name": "YOLOModel", "weight_path": "weights/yolov5s_v5.flax.npz",
        "dtype": "float32", "nms": True, "warmup": False, "pos_thre": 0.25,
        "nms_thre": 0.45, "multiscale_pred": 0, "multiscale_partition": 2,
        "input_hw": "96x96"}})
    det = MLDetector(window_sec=1.0, fps=2.0,
                     mask=np.ones((48, 96, 3), np.uint8), num_cls=9,
                     cfg=cfg, logger=get_default_logger())
    det._hist = jnp.ones_like(det._hist)
    det.reset_device_state()
    assert det._hist.shape == (1, 48, 96, 3)
    assert not np.asarray(det._hist).any()


def test_forward_per_level_failure_recovery(tmp_path):
    """A failing pyramid level loses only that level: partial results from
    the other levels are still returned (the batched analog of the
    reference's per-tile exception skip, MetLib/model.py:374-383)."""
    from metdetpy_tpu.log import BaseMetLog
    from metdetpy_tpu.models.yolo import YOLOModel
    model = YOLOModel(weight_path=str(tmp_path / "missing.npz"),
                      nms=True, warmup=False, multiscale_pred=2,
                      multiscale_partition=2, logger=BaseMetLog(),
                      input_hw=HW)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (200, 320, 3), np.uint8)

    calls = {"n": 0}
    orig = model._forward_tiles

    def flaky(x, tiles):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected tile failure")
        return orig(x, tiles)

    model._forward_tiles = flaky
    boxes, cls = model.forward(img)  # must not raise
    assert calls["n"] == 2
    assert boxes.ndim == 2 and boxes.shape[1] == 4

    # all levels failing -> clean empty result
    model._forward_tiles = lambda x, tiles: (_ for _ in ()).throw(
        RuntimeError("boom"))
    boxes, cls = model.forward(img)
    assert len(boxes) == 0 and cls.shape == (0, 8)
