"""ctypes bindings for the native host runtime (libmetring.so).

Builds on demand with the bundled Makefile; every entry point has a numpy
fallback so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmetring.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        ret = subprocess.run(["make", "-C", _HERE], capture_output=True,
                             timeout=120)
        return ret.returncode == 0
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.metring_create.restype = ctypes.c_void_p
    lib.metring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.metring_destroy.argtypes = [ctypes.c_void_p]
    lib.metring_close.argtypes = [ctypes.c_void_p]
    lib.metring_put.restype = ctypes.c_int
    lib.metring_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int]
    lib.metring_get.restype = ctypes.c_int
    lib.metring_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int]
    lib.metring_size.restype = ctypes.c_size_t
    lib.metring_size.argtypes = [ctypes.c_void_p]
    lib.metring_u8_max_inplace.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                           ctypes.c_size_t]
    lib.metring_u8_block_max.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                         ctypes.c_size_t, ctypes.c_char_p]
    lib.metring_bgr2gray.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                     ctypes.c_char_p]
    lib.metring_resize_linear_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.metring_resize_assemble_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p]
    _lib = lib
    return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_char_p)


class FrameRing:
    """Native bounded frame ring; falls back to a Python deque-free numpy
    ring when the library is unavailable."""

    def __init__(self, n_slots: int, frame_shape: tuple[int, ...],
                 dtype=np.uint8) -> None:
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.slot_bytes = int(np.prod(frame_shape)) * self.dtype.itemsize
        self._lib = get_lib()
        if self._lib is not None:
            self._handle = self._lib.metring_create(n_slots, self.slot_bytes)
            if not self._handle:
                self._lib = None
        if self._lib is None:
            import queue
            self._q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=n_slots)

    def put(self, frame: np.ndarray, timeout: float = 10.0) -> bool:
        frame = np.ascontiguousarray(frame, dtype=self.dtype)
        if self._lib is not None:
            return self._lib.metring_put(self._handle, _ptr(frame),
                                         int(timeout * 1000)) == 0
        import queue
        try:
            self._q.put(frame.copy(), timeout=timeout)
            return True
        except queue.Full:
            return False

    def get(self, out: Optional[np.ndarray] = None,
            timeout: float = 10.0) -> Optional[np.ndarray]:
        if out is None:
            out = np.empty(self.frame_shape, dtype=self.dtype)
        if self._lib is not None:
            ok = self._lib.metring_get(self._handle, _ptr(out),
                                       int(timeout * 1000)) == 0
            return out if ok else None
        import queue
        try:
            item = self._q.get(timeout=timeout)
        except queue.Empty:
            return None
        out[...] = item
        return out

    def close(self) -> None:
        if self._lib is not None:
            self._lib.metring_close(self._handle)

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.metring_size(self._handle))
        return self._q.qsize()

    def __del__(self):
        try:
            if self._lib is not None and self._handle:
                self._lib.metring_destroy(self._handle)
        except Exception:
            pass


def u8_max_inplace(dst: np.ndarray, src: np.ndarray) -> None:
    """dst = max(dst, src) for contiguous uint8 arrays."""
    lib = get_lib()
    if lib is not None and dst.flags.c_contiguous and src.flags.c_contiguous:
        lib.metring_u8_max_inplace(_ptr(dst), _ptr(src), dst.size)
    else:
        np.maximum(dst, src, out=dst)


def u8_block_max(frames: np.ndarray) -> np.ndarray:
    """Max over axis 0 of a contiguous [T, ...] uint8 array."""
    lib = get_lib()
    out = np.empty(frames.shape[1:], dtype=np.uint8)
    if lib is not None and frames.flags.c_contiguous:
        stride = int(np.prod(frames.shape[1:]))
        lib.metring_u8_block_max(_ptr(frames), frames.shape[0], stride,
                                 _ptr(out))
    else:
        np.max(frames, axis=0, out=out)
    return out


def bgr2gray(bgr: np.ndarray) -> np.ndarray:
    """cv2-compatible BT.601 BGR->gray for contiguous uint8 HxWx3."""
    lib = get_lib()
    if lib is not None and bgr.flags.c_contiguous:
        out = np.empty(bgr.shape[:2], dtype=np.uint8)
        lib.metring_bgr2gray(_ptr(bgr), bgr.shape[0] * bgr.shape[1],
                             _ptr(out))
        return out
    import cv2
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)


def resize_linear_u8(src: np.ndarray, dsize: tuple[int, int],
                     dst: Optional[np.ndarray] = None) -> np.ndarray:
    """u8 grayscale bilinear resize, bit-exact with cv2.resize
    INTER_LINEAR (fixed-point 11-bit path). dsize is (w, h) like cv2.
    Falls back to cv2 when the native library is unavailable."""
    w, h = dsize
    lib = get_lib()
    if dst is None:
        dst = np.empty((h, w), np.uint8)
    # bit-exactness with cv2 is verified for DOWNSCALE (the only case the
    # pipeline hits: runtime size <= raw size); cv2's upscale path rounds
    # differently, so defer to it there
    if (lib is not None and src.flags.c_contiguous
            and dst.flags.c_contiguous and src.ndim == 2
            and h <= src.shape[0] and w <= src.shape[1]):
        lib.metring_resize_linear_u8(_ptr(src), src.shape[0], src.shape[1],
                                     _ptr(dst), h, w)
        return dst
    import cv2
    cv2.resize(src, dsize, dst=dst, interpolation=cv2.INTER_LINEAR)
    return dst


def resize_assemble_u8(frames: list, block: np.ndarray, n_start: int,
                       exp_frame: int = 1,
                       scratch: Optional[np.ndarray] = None) -> int:
    """Resize + exposure-max-merge a chunk of gray frames into consecutive
    block slots in ONE native call (one GIL release for the whole chunk:
    under active TPU-client streaming, per-frame Python work measured
    10-40x slower than the same work batched in C).

    frames: list of [sh, sw] u8 contiguous arrays, length a multiple of
    exp_frame. block: [*, dh, dw] u8; writes len(frames)//exp_frame slots
    starting at n_start. Returns slots written; falls back to per-frame
    cv2 when the native library is missing.
    """
    n = len(frames)
    dh, dw = block.shape[1], block.shape[2]
    n_out = n // exp_frame
    lib = get_lib()
    if (lib is not None and all(f.flags.c_contiguous for f in frames)
            and dh <= frames[0].shape[0] and dw <= frames[0].shape[1]):
        ptrs = (ctypes.c_void_p * n)(*[f.ctypes.data for f in frames])
        if scratch is None and exp_frame > 1:
            scratch = np.empty((dh, dw), np.uint8)
        sp = _ptr(scratch) if scratch is not None else None
        dst_view = block[n_start:]
        lib.metring_resize_assemble_u8(
            ptrs, n, frames[0].shape[0], frames[0].shape[1],
            _ptr(dst_view), dh, dw, exp_frame, sp)
        return n_out
    import cv2
    for g in range(n_out):
        slot = block[n_start + g]
        for k in range(exp_frame):
            f = frames[g * exp_frame + k]
            if k == 0:
                cv2.resize(f, (dw, dh), dst=slot,
                           interpolation=cv2.INTER_LINEAR)
            else:
                tmp = cv2.resize(f, (dw, dh),
                                 interpolation=cv2.INTER_LINEAR)
                np.maximum(slot, tmp, out=slot)
    return n_out
