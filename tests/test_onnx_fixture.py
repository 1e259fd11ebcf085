"""Built-in ONNX wire parser vs an INDEPENDENTLY-produced fixture.

tests/fixtures/tiny_protoc.onnx was serialized by Google protobuf's
encoder from a protoc-compiled transcription of the public ONNX schema
(tools/onnx_fixture/make_fixture.py) -- no code shared with the parser
under test, breaking the writer/parser circularity of the hand-written
emitter in test_yolo.py. Runs unconditionally (no onnx/torch needed).
"""

import os

import numpy as np

from metdetpy_tpu.models.weights import parse_onnx_initializers

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_protoc.onnx")


def test_fixture_parses_all_initializers():
    tensors = parse_onnx_initializers(FIXTURE)
    assert set(tensors) == {"conv.weight", "conv.bias", "reshape.shape",
                            "pads", "scales", "axes"}


def test_fixture_float_tensors():
    tensors = parse_onnx_initializers(FIXTURE)
    rng = np.random.default_rng(42)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    np.testing.assert_array_equal(tensors["conv.weight"], w)  # raw_data
    assert tensors["conv.weight"].dtype == np.float32
    np.testing.assert_array_equal(tensors["conv.bias"], b)    # float_data
    np.testing.assert_allclose(tensors["scales"],
                               [0.5, -1.25, 3e10])            # double_data
    assert tensors["scales"].dtype == np.float64


def test_fixture_negative_int_varints():
    """protobuf encodes negative int32/int64 values as 10-byte
    two's-complement varints; the parser must fold them back to signed."""
    tensors = parse_onnx_initializers(FIXTURE)
    np.testing.assert_array_equal(tensors["reshape.shape"], [-1, 4, 0])
    assert tensors["reshape.shape"].dtype == np.int64
    np.testing.assert_array_equal(tensors["pads"], [-2, -1, 0, 3])
    assert tensors["pads"].dtype == np.int32


def test_fixture_int64_raw_data():
    tensors = parse_onnx_initializers(FIXTURE)
    np.testing.assert_array_equal(tensors["axes"],
                                  [-5, 1 << 40, -(1 << 33)])
    assert tensors["axes"].dtype == np.int64
