"""Full-depth numeric weight-conversion proof (VERDICT r4 #9).

The reference's pretrained ONNX (weights/yolov5s_v2.onnx) is an LFS
pointer in this mount, so real-weight comparison is impossible in-env.
This test closes the "converter works on toys" gap without it: an
INDEPENDENT torch transcription of the public ultralytics yolov5s v6.0
architecture (the graph the reference's ONNX was exported from,
reference MetLib/model.py:73-166 runs it via onnxruntime) is built at
REAL widths (width 0.50 / depth 0.33: channels 32..512, C3 depths 1-3,
SPPF, 3 detect heads), randomly initialized — including BN running
stats — and evaluated in torch. Its state_dict goes through
``convert_state_dict`` into the Flax tree, and the Flax forward must
reproduce the torch forward numerically on the same input.

torch is the independent reference evaluator here (CPU wheel baked into
the image); no code is shared between the two model definitions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from metdetpy_tpu.models import yolov5  # noqa: E402
from metdetpy_tpu.models.weights import convert_state_dict  # noqa: E402

NC = 8


class TConv(tnn.Module):
    """ultralytics Conv: Conv2d(no bias) + BN(eps 1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = tnn.Conv2d(c1, c2, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True, e=1.0):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(
            *[TBottleneck(c_, c_, shortcut, e=1.0) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.mp = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.mp(x)
        y2 = self.mp(y1)
        return self.cv2(torch.cat((x, y1, y2, self.mp(y2)), 1))


class TDetectConvs(tnn.Module):
    """Detect head convs only (the raw-head comparison point; decode is
    a separate pure function on both sides)."""

    def __init__(self, nc, chs):
        super().__init__()
        self.m = tnn.ModuleList(
            [tnn.Conv2d(c, 3 * (5 + nc), 1) for c in chs])


class TYolo5s(tnn.Module):
    """yolov5s v6.0 graph at real widths, model.N module names matching
    the ultralytics state_dict layout the converter consumes."""

    def __init__(self, nc=NC):
        super().__init__()
        self.model = tnn.ModuleList([
            TConv(3, 32, 6, 2, 2),        # 0  P1/2
            TConv(32, 64, 3, 2),          # 1  P2/4
            TC3(64, 64, 1),               # 2
            TConv(64, 128, 3, 2),         # 3  P3/8
            TC3(128, 128, 2),             # 4
            TConv(128, 256, 3, 2),        # 5  P4/16
            TC3(256, 256, 3),             # 6
            TConv(256, 512, 3, 2),        # 7  P5/32
            TC3(512, 512, 1),             # 8
            TSPPF(512, 512, 5),           # 9
            TConv(512, 256, 1, 1),        # 10
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 11
            tnn.Identity(),               # 12 concat
            TC3(512, 256, 1, False),      # 13
            TConv(256, 128, 1, 1),        # 14
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 15
            tnn.Identity(),               # 16 concat
            TC3(256, 128, 1, False),      # 17
            TConv(128, 128, 3, 2),        # 18
            tnn.Identity(),               # 19 concat
            TC3(256, 256, 1, False),      # 20
            TConv(256, 256, 3, 2),        # 21
            tnn.Identity(),               # 22 concat
            TC3(512, 512, 1, False),      # 23
            TDetectConvs(nc, (128, 256, 512)),              # 24
        ])

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        p5 = m[9](x)
        h10 = m[10](p5)
        x = torch.cat((m[11](h10), p4), 1)
        h13 = m[13](x)
        h14 = m[14](h13)
        x = torch.cat((m[15](h14), p3), 1)
        out3 = m[17](x)
        x = torch.cat((m[18](out3), h14), 1)
        out4 = m[20](x)
        x = torch.cat((m[21](out4), h10), 1)
        out5 = m[23](x)
        return [m[24].m[i](f) for i, f in enumerate((out3, out4, out5))]


def _randomize(model: tnn.Module, seed: int = 3) -> None:
    """Fill every parameter AND BN running stat with controlled random
    values: fan-in-scaled conv weights keep 24 layers of activations
    finite; BN stats are randomized so the conversion of running
    mean/var is actually exercised (an all-default BN would pass even if
    the converter dropped them)."""
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        shape = tuple(v.shape)
        if k.endswith("conv.weight") or ".m." in k and k.endswith("weight") \
                and v.ndim == 4:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0, (2.0 / fan_in) ** 0.5, shape)
        elif k.endswith("running_var"):
            arr = rng.uniform(0.5, 1.5, shape)
        elif k.endswith("running_mean"):
            arr = rng.normal(0, 0.1, shape)
        elif k.endswith("bn.weight"):
            arr = rng.uniform(0.5, 1.5, shape)
        elif k.endswith("num_batches_tracked"):
            continue
        elif v.ndim == 4:                      # detect-head conv weights
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0, (2.0 / fan_in) ** 0.5, shape)
        else:                                  # biases / bn.bias
            arr = rng.normal(0, 0.1, shape)
        sd[k] = torch.from_numpy(np.ascontiguousarray(arr, np.float32))
    model.load_state_dict(sd)


def test_convert_state_dict_full_depth_numeric():
    import jax.numpy as jnp

    tmodel = TYolo5s()
    _randomize(tmodel)
    tmodel.eval()

    rng = np.random.default_rng(9)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        theads = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    theads = [h.numpy().transpose(0, 2, 3, 1) for h in theads]

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = convert_state_dict(sd)
    fmodel = yolov5.YOLOv5(nc=NC, dtype=jnp.float32)
    fheads = fmodel.apply(variables, jnp.asarray(img))

    assert len(fheads) == len(theads) == 3
    for i, (fh, th) in enumerate(zip(fheads, theads)):
        fh = np.asarray(fh)
        assert fh.shape == th.shape, (i, fh.shape, th.shape)
        scale = max(np.abs(th).max(), 1.0)
        np.testing.assert_allclose(fh, th, rtol=2e-4,
                                   atol=2e-4 * scale,
                                   err_msg=f"head {i}")


def test_convert_state_dict_full_depth_bf16_tolerance():
    """The production path runs the body in bfloat16 on the MXU; the
    converted weights must still reproduce the torch fp32 forward within
    a bf16-budget tolerance (relative ~1%, the expected bf16 rounding
    accumulation over this depth)."""
    import jax.numpy as jnp

    tmodel = TYolo5s()
    _randomize(tmodel, seed=4)
    tmodel.eval()

    rng = np.random.default_rng(10)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        theads = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    theads = [h.numpy().transpose(0, 2, 3, 1) for h in theads]

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = convert_state_dict(sd)
    fmodel = yolov5.YOLOv5(nc=NC, dtype=jnp.bfloat16)
    fheads = fmodel.apply(variables, jnp.asarray(img))
    for i, (fh, th) in enumerate(zip(fheads, theads)):
        fh = np.asarray(fh, np.float32)
        denom = max(float(np.abs(th).std()), 1e-3)
        rel = np.abs(fh - th) / denom
        # bf16 has ~3 decimal digits; demand 99% of outputs within 5%
        # of the fp32 reference's scale and no wild outliers
        assert np.quantile(rel, 0.99) < 0.05, (i, np.quantile(rel, 0.99))
        assert rel.max() < 0.5, (i, rel.max())


def test_convert_onnx_full_graph_wire_roundtrip(tmp_path):
    """convert_onnx on a REAL-SIZE ONNX FILE: the full-depth state dict
    (≈28 MB of fp32 raw_data, the layout ultralytics exporters emit) is
    serialized through Google protobuf's encoder from a protoc-compiled
    ONNX schema (tools/onnx_fixture/onnx_mini.proto -- an independent
    producer sharing no code with the built-in wire parser), then parsed
    back by convert_onnx. The resulting Flax tree must be bit-identical
    to convert_state_dict of the same arrays, closing the
    "wire parser works on toys" gap (VERDICT r4 #9) without the
    LFS-absent weights/yolov5s_v2.onnx."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "onnx_fixture"))
    try:
        import onnx_mini_pb2 as pb
    finally:
        sys.path.pop(0)
    from metdetpy_tpu.models.weights import convert_onnx, flatten_tree

    tmodel = TYolo5s()
    _randomize(tmodel, seed=7)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith("num_batches_tracked")}

    m = pb.ModelProto()
    m.ir_version = 8
    m.producer_name = "full-depth-independent-fixture"
    g = m.graph
    g.name = "yolov5s"
    g.input.add().name = "images"
    g.output.add().name = "output"
    for name, arr in sd.items():
        t = g.initializer.add()
        t.name = name
        t.data_type = 1                    # fp32
        t.dims.extend(arr.shape)
        t.raw_data = np.ascontiguousarray(arr, np.float32).tobytes()
    path = str(tmp_path / "yolov5s_full.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    assert os.path.getsize(path) > 20 << 20   # real-size graph

    got = flatten_tree(convert_onnx(path))
    want = flatten_tree(convert_state_dict(sd))
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        assert got[k].dtype == want[k].dtype, k
