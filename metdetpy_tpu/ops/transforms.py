"""Device-side preprocessing transforms over frame blocks.

TPU-native analog of the reference's per-frame Transform pipeline
(reference MetLib/imgproc.py:70-158): a composable op list executed on
``[T, H, W, C]`` (or ``[T, H, W]``) uint8 blocks under jit. Resize and
color conversions match the OpenCV variants used by the reference closely
enough for detection parity (bilinear resize, BT.601 grayscale).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

UINT8_MAX = 255
UINT16_MAX = 65535

# BT.601 luma weights used by cv2.cvtColor BGR2GRAY
_B, _G, _R = 0.114, 0.587, 0.299


def bgr2gray(img: jax.Array) -> jax.Array:
    """[..., 3] BGR uint8 -> [...] uint8, cv2 BGR2GRAY semantics
    (y = 0.299 R + 0.587 G + 0.114 B, rounded)."""
    f = img.astype(jnp.float32)
    y = f[..., 0] * _B + f[..., 1] * _G + f[..., 2] * _R
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def rgb2gray(img: jax.Array) -> jax.Array:
    f = img.astype(jnp.float32)
    y = f[..., 0] * _R + f[..., 1] * _G + f[..., 2] * _B
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def gray2bgr(img: jax.Array) -> jax.Array:
    return jnp.repeat(img[..., None], 3, axis=-1)


def bgr2gray_exact(img: jax.Array) -> jax.Array:
    """[..., 3] BGR uint8 -> [...] uint8, BIT-EXACT with cv2's u8 path
    (15-bit fixed-point coefficients summing to 1<<15; verified against
    cv2 5.0 in tests -- same math as native/metring.cpp)."""
    b = img[..., 0].astype(jnp.uint32)
    g = img[..., 1].astype(jnp.uint32)
    r = img[..., 2].astype(jnp.uint32)
    return ((3735 * b + 19235 * g + 9798 * r + (1 << 14)) >> 15).astype(
        jnp.uint8)


def downscale2x_exact(block: jax.Array) -> jax.Array:
    """Exact cv2.resize INTER_LINEAR for the 2:1 case on [..., H, W(, C)]
    uint8: source coords hit pixel-pair midpoints with coefficient
    1024/1024, and OpenCV's fixed-point combine reduces algebraically to
    ((x00 + x01 + x10 + x11 + 2) >> 2)."""
    has_c = block.ndim >= 3 and block.shape[-1] in (1, 3, 4)
    ha = block.ndim - (3 if has_c else 2)  # H axis index
    x = block.astype(jnp.uint16)
    x = jax.lax.slice_in_dim(x, 0, None, 2, ha) \
        + jax.lax.slice_in_dim(x, 1, None, 2, ha)
    x = jax.lax.slice_in_dim(x, 0, None, 2, ha + 1) \
        + jax.lax.slice_in_dim(x, 1, None, 2, ha + 1)
    return ((x + 2) >> 2).astype(jnp.uint8)


def make_block_preprocess(down2: bool, color: bool):
    """Jitted cv2-BIT-EXACT device preprocess for the hot feed path:
    (optional) exact 2:1 downscale then (for color sources) exact BT.601
    grayscale -- the same resize-then-gray order as HostPreprocess. Lets
    the loader upload RAW decoded blocks and keep the whole preprocess
    on device (host does only codec decode)."""

    @jax.jit
    def fn(block: jax.Array) -> jax.Array:
        out = downscale2x_exact(block) if down2 else block
        return bgr2gray_exact(out) if color else out

    return fn


def resize_bilinear(img: jax.Array, dsize_wh: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [..., H, W(, C)] uint8 to (w, h)."""
    w, h = dsize_wh
    has_c = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    if has_c:
        shape = img.shape[:-3] + (h, w, img.shape[-1])
    else:
        shape = img.shape[:-2] + (h, w)
    out = jax.image.resize(img.astype(jnp.float32), shape, method="bilinear")
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def debayer_bilinear(raw: jax.Array, pattern: str = "BGGR") -> jax.Array:
    """Simple bilinear demosaic of a [..., H, W] Bayer mosaic to BGR.

    Supports the BGGR / RGGB patterns accepted by the reference
    (MetLib/imgproc.py:74-77, :123-127).
    """
    assert pattern in ("BGGR", "RGGB"), f"unsupported pattern {pattern}"
    f = raw.astype(jnp.float32)
    h_ax, w_ax = raw.ndim - 2, raw.ndim - 1
    pad = jnp.pad(f, [(0, 0)] * (raw.ndim - 2) + [(1, 1), (1, 1)],
                  mode="edge")

    def sh(dy: int, dx: int) -> jax.Array:
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(pad, dy, dy + raw.shape[h_ax], axis=h_ax),
            dx, dx + raw.shape[w_ax], axis=w_ax)

    cross = (sh(0, 1) + sh(2, 1) + sh(1, 0) + sh(1, 2)) / 4.0
    diag = (sh(0, 0) + sh(0, 2) + sh(2, 0) + sh(2, 2)) / 4.0
    horiz = (sh(1, 0) + sh(1, 2)) / 2.0
    vert = (sh(0, 1) + sh(2, 1)) / 2.0

    yy = jnp.arange(raw.shape[h_ax]) % 2
    xx = jnp.arange(raw.shape[w_ax]) % 2
    ys = yy.reshape((1,) * (raw.ndim - 2) + (-1, 1))
    xs = xx.reshape((1,) * (raw.ndim - 2) + (1, -1))
    at00 = (ys == 0) & (xs == 0)
    at01 = (ys == 0) & (xs == 1)
    at10 = (ys == 1) & (xs == 0)
    at11 = (ys == 1) & (xs == 1)

    # BGGR: (0,0)=B, (0,1)=G, (1,0)=G, (1,1)=R. RGGB swaps B and R.
    b_plane = jnp.where(at00, f, jnp.where(at01, horiz,
                        jnp.where(at10, vert, diag)))
    g_plane = jnp.where(at00 | at11, cross, f)
    r_plane = jnp.where(at11, f, jnp.where(at10, horiz,
                        jnp.where(at01, vert, diag)))
    if pattern == "RGGB":
        b_plane, r_plane = r_plane, b_plane
    out = jnp.stack([b_plane, g_plane, r_plane], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def u16_to_u8(img: jax.Array) -> jax.Array:
    return (img.astype(jnp.uint16) // 257).astype(jnp.uint8)


class Transform:
    """Composable device transform pipeline over a frame block.

    API parity with the reference Transform (MetLib/imgproc.py:70-158); the
    op list is applied in order inside a single jitted call.
    """

    MASK_FLAG = "MASK"

    def __init__(self) -> None:
        self.transform: list[Callable[[jax.Array], jax.Array]] = []

    def resize(self, dsize: list[int], **_: Any) -> None:
        self.transform.append(
            lambda img: resize_bilinear(img, (dsize[0], dsize[1])))

    # opencv_* aliases keep reference config/call-site compatibility
    opencv_resize = resize

    def opencv_BGR2GRAY(self) -> None:
        self.transform.append(bgr2gray)

    def opencv_RGB2GRAY(self) -> None:
        self.transform.append(rgb2gray)

    def opencv_GRAY2BGR(self) -> None:
        self.transform.append(gray2bgr)

    def opencv_debayer(self, pattern: str = "BGGR") -> None:
        self.transform.append(lambda img: debayer_bilinear(img, pattern))

    def mask_with(self, mask) -> None:
        mask_arr = jnp.asarray(mask)
        self.transform.append(lambda img: img * mask_arr)

    def expand_3rd_channel(self, num: int) -> None:
        assert isinstance(num, int) and num > 0
        self.transform.append(lambda img: jnp.repeat(img[..., None], num, -1)
                              if num > 1 else img[..., None])

    def opencv_binary(self, threshold, maxval: int = 255,
                      inv: bool = False) -> None:
        if inv:
            self.transform.append(lambda img: jnp.where(
                img > threshold, jnp.uint8(0), jnp.uint8(maxval)))
        else:
            self.transform.append(lambda img: jnp.where(
                img > threshold, jnp.uint8(maxval), jnp.uint8(0)))

    def u16_to_u8(self) -> None:
        self.transform.append(u16_to_u8)

    def exec_transform(self, img: jax.Array) -> jax.Array:
        for fn in self.transform:
            img = fn(img)
        return img

    def __call__(self, img: jax.Array) -> jax.Array:
        return self.exec_transform(img)
