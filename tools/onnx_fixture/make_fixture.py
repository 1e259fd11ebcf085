"""Generate tests/fixtures/tiny_protoc.onnx with an INDEPENDENT encoder.

The repo's built-in ONNX wire parser (metdetpy_tpu/models/weights.py) must
not be validated only against the hand-written test writer in
tests/test_yolo.py (writer and parser could share a wire-format
misunderstanding). This tool serializes a small ONNX model through Google
protobuf's C++ encoder from a protoc-compiled transcription of the public
ONNX schema (onnx_mini.proto) -- a producer with no code in common with
the parser under test.

Regenerate with:
    protoc --python_out=tools/onnx_fixture tools/onnx_fixture/onnx_mini.proto \
        -I tools/onnx_fixture
    python tools/onnx_fixture/make_fixture.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import onnx_mini_pb2 as pb  # noqa: E402

OUT = os.path.join(HERE, "..", "..", "tests", "fixtures",
                   "tiny_protoc.onnx")

rng = np.random.default_rng(42)

m = pb.ModelProto()
m.ir_version = 8
m.producer_name = "protoc-independent-fixture"
m.producer_version = "1.0"
g = m.graph
g.name = "tiny"
g.input.add().name = "images"
g.output.add().name = "output"

# conv weight via raw_data (the path real exporters use for weights)
w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
t = g.initializer.add()
t.name = "conv.weight"
t.data_type = 1
t.dims.extend(w.shape)
t.raw_data = w.tobytes()

# bias via float_data (packed repeated floats)
b = rng.standard_normal((4,)).astype(np.float32)
t = g.initializer.add()
t.name = "conv.bias"
t.data_type = 1
t.dims.extend(b.shape)
t.float_data.extend(b.tolist())

# Reshape shape with NEGATIVE int64s (protobuf encodes -1 as a 10-byte
# varint; exercises the parser's sign fold)
t = g.initializer.add()
t.name = "reshape.shape"
t.data_type = 7
t.dims.extend([3])
t.int64_data.extend([-1, 4, 0])

# negative int32s through int32_data
t = g.initializer.add()
t.name = "pads"
t.data_type = 6
t.dims.extend([4])
t.int32_data.extend([-2, -1, 0, 3])

# doubles
d = np.array([0.5, -1.25, 3e10])
t = g.initializer.add()
t.name = "scales"
t.data_type = 11
t.dims.extend(d.shape)
t.double_data.extend(d.tolist())

# int64 raw_data with negatives (two's complement little-endian bytes)
i64 = np.array([-5, 1 << 40, -(1 << 33)], np.int64)
t = g.initializer.add()
t.name = "axes"
t.data_type = 7
t.dims.extend(i64.shape)
t.raw_data = i64.tobytes()

n = g.node.add()
n.op_type = "Conv"
n.name = "conv0"
n.input.extend(["images", "conv.weight", "conv.bias"])
n.output.append("conv_out")

with open(OUT, "wb") as f:
    f.write(m.SerializeToString())
print(OUT, os.path.getsize(OUT), "bytes")
