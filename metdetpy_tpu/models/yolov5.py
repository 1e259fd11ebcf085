"""Flax YOLOv5s: TPU-native reimplementation of the reference's ONNX model.

The reference runs weights/yolov5s_v2.onnx through onnxruntime one tile at a
time under a global lock (MetLib/model.py:73-166). Here the network is a
Flax module compiled by XLA: convolutions ride the MXU in bfloat16, tiles
batch into a single forward, and decode + NMS stay on device.

Architecture: YOLOv5 v6.0 "s" variant (depth 0.33 / width 0.50):
backbone CSPDarknet (Conv6x6s2 stem, C3 blocks, SPPF) + PANet head,
3 detection scales with 3 anchors each, SiLU activations, BN eps 1e-3.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# default anchors (v5s, 640px): per scale [w, h] x 3
DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),       # P3/8
    ((30, 61), (62, 45), (59, 119)),      # P4/16
    ((116, 90), (156, 198), (373, 326)),  # P5/32
)
STRIDES = (8, 16, 32)


def _make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class ConvBNAct(nn.Module):
    """Conv2D + BatchNorm(inference) + SiLU."""
    c_out: int
    k: int = 1
    s: int = 1
    p: int | None = None
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.p if self.p is not None else self.k // 2
        x = nn.Conv(self.c_out, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.03, dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    c_out: int
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_hidden = int(self.c_out * self.e)
        y = ConvBNAct(c_hidden, 1, 1, dtype=self.dtype, name="cv1")(x)
        y = ConvBNAct(self.c_out, 3, 1, dtype=self.dtype, name="cv2")(y)
        if self.shortcut and x.shape[-1] == self.c_out:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions."""
    c_out: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_hidden = int(self.c_out * self.e)
        a = ConvBNAct(c_hidden, 1, 1, dtype=self.dtype, name="cv1")(x)
        b = ConvBNAct(c_hidden, 1, 1, dtype=self.dtype, name="cv2")(x)
        for i in range(self.n):
            a = Bottleneck(c_hidden, self.shortcut, e=1.0, dtype=self.dtype,
                           name=f"m{i}")(a)
        return ConvBNAct(self.c_out, 1, 1, dtype=self.dtype,
                         name="cv3")(jnp.concatenate([a, b], axis=-1))


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained same-k maxpools."""
    c_out: int
    k: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_hidden = x.shape[-1] // 2
        x = ConvBNAct(c_hidden, 1, 1, dtype=self.dtype, name="cv1")(x)
        p = self.k // 2
        pool = lambda v: nn.max_pool(v, (self.k, self.k), strides=(1, 1),
                                     padding=((p, p), (p, p)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBNAct(self.c_out, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1))


class YOLOv5(nn.Module):
    """YOLOv5 backbone+head; returns raw per-scale predictions."""
    nc: int = 8
    width: float = 0.50
    depth: float = 0.33
    dtype: Any = jnp.bfloat16

    def _w(self, c: int) -> int:
        return _make_divisible(c * self.width)

    def _d(self, n: int) -> int:
        return max(round(n * self.depth), 1)

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] float in [0, 1]. Returns list of 3 raw heads
        [B, h_i, w_i, 3*(5+nc)]."""
        w, d, dt = self._w, self._d, self.dtype
        x = x.astype(dt)
        # backbone
        x = ConvBNAct(w(64), 6, 2, 2, dtype=dt, name="b0")(x)       # P1/2
        x = ConvBNAct(w(128), 3, 2, dtype=dt, name="b1")(x)         # P2/4
        x = C3(w(128), d(3), dtype=dt, name="b2")(x)
        x = ConvBNAct(w(256), 3, 2, dtype=dt, name="b3")(x)         # P3/8
        p3 = C3(w(256), d(6), dtype=dt, name="b4")(x)
        x = ConvBNAct(w(512), 3, 2, dtype=dt, name="b5")(p3)        # P4/16
        p4 = C3(w(512), d(9), dtype=dt, name="b6")(x)
        x = ConvBNAct(w(1024), 3, 2, dtype=dt, name="b7")(p4)       # P5/32
        x = C3(w(1024), d(3), dtype=dt, name="b8")(x)
        p5 = SPPF(w(1024), 5, dtype=dt, name="b9")(x)
        # head (PANet)
        h10 = ConvBNAct(w(512), 1, 1, dtype=dt, name="h10")(p5)
        x = _upsample2x(h10)
        x = jnp.concatenate([x, p4], axis=-1)
        h13 = C3(w(512), d(3), shortcut=False, dtype=dt, name="h13")(x)
        h14 = ConvBNAct(w(256), 1, 1, dtype=dt, name="h14")(h13)
        x = _upsample2x(h14)
        x = jnp.concatenate([x, p3], axis=-1)
        out3 = C3(w(256), d(3), shortcut=False, dtype=dt, name="h17")(x)
        x = ConvBNAct(w(256), 3, 2, dtype=dt, name="h18")(out3)
        x = jnp.concatenate([x, h14], axis=-1)
        out4 = C3(w(512), d(3), shortcut=False, dtype=dt, name="h20")(x)
        x = ConvBNAct(w(512), 3, 2, dtype=dt, name="h21")(out4)
        x = jnp.concatenate([x, h10], axis=-1)
        out5 = C3(w(1024), d(3), shortcut=False, dtype=dt, name="h23")(x)
        # detect heads: plain conv with bias
        no = 3 * (5 + self.nc)
        heads = []
        for i, feat in enumerate((out3, out4, out5)):
            heads.append(nn.Conv(no, (1, 1), dtype=jnp.float32,
                                 name=f"detect{i}")(feat.astype(jnp.float32)))
        return heads


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def decode_predictions(heads: Sequence[jax.Array], nc: int,
                       anchors=DEFAULT_ANCHORS,
                       strides=STRIDES) -> jax.Array:
    """Decode raw heads to [B, N, 5+nc] (xywh in px, obj, cls) with the
    YOLOv5 v5+ box parameterization: xy = (2*sig(xy) - 0.5 + grid) * stride,
    wh = (2*sig(wh))^2 * anchor."""
    outs = []
    for head, anc, stride in zip(heads, anchors, strides):
        b, h, w, _ = head.shape
        p = head.reshape(b, h, w, 3, 5 + nc)
        p = jax.nn.sigmoid(p)
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        anc_arr = jnp.asarray(anc, dtype=jnp.float32)  # [3, 2]
        xy = (p[..., 0:2] * 2.0 - 0.5
              + jnp.stack(jnp.broadcast_arrays(gx, gy), axis=-1)) * stride
        wh = jnp.square(p[..., 2:4] * 2.0) * anc_arr[None, None, None]
        rest = p[..., 4:]
        outs.append(jnp.concatenate([xy, wh, rest],
                                    axis=-1).reshape(b, h * w * 3, 5 + nc))
    return jnp.concatenate(outs, axis=1)


def init_params(nc: int = 8, input_hw: tuple[int, int] = (640, 640),
                seed: int = 0):
    """Randomly initialized parameters (documented fallback when the
    reference's LFS weights are unavailable; see weights.py for the ONNX
    conversion path)."""
    model = YOLOv5(nc=nc)
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy)
    return model, variables
