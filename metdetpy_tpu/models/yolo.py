"""YOLOModel runtime: preprocessing, batched multiscale tiling, device NMS.

API parity with reference YOLOModel (MetLib/model.py:169-400):
``forward(img) -> (boxes [N,4] int, cls_scores [N,nc])`` with
score = sqrt(cls * obj_conf) and the multiscale pyramid inference scheme
(transpose-to-match-aspect + h_rep x w_rep tiling with 0.2 min overlap per
level).

TPU-native differences:
  - all tiles of a pyramid level run as ONE batched forward (the reference
    issues one onnxruntime call per tile under a global lock,
    MetLib/model.py:341-383);
  - NMS runs on device with correct xyxy IoU. (The reference passes xyxy
    boxes to cv2.dnn.NMSBoxes, which expects xywh -- a latent bug that only
    weakens its suppression; we do not replicate it.)
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..log import BaseMetLog, get_default_logger
from ..ops.nms import nms_xyxy
from ..utils import get_num_class
from . import yolov5
from .weights import convert_onnx, is_lfs_pointer, load_params

PARTITION_MIN_OVERLAP = 0.2
MULTISCALE_NMS_OVERLAP_THRE = 0.1
DEFAULT_INPUT_HW = (640, 640)


def _ensure_3ch(x: np.ndarray) -> np.ndarray:
    """Expand grayscale / drop alpha so the model always sees 3 channels
    (the reference's channel-expand preprocess, MetLib/imgproc.py:128-135;
    loaders keep IMREAD_UNCHANGED semantics so single-channel images reach
    the model)."""
    if x.ndim == 2 or (x.ndim == 3 and x.shape[-1] == 1):
        x = x.reshape(*x.shape[:2])
        return np.repeat(x[..., None], 3, axis=-1)
    if x.ndim == 3 and x.shape[-1] == 4:
        return x[..., :3]
    return x


def _unit_f32(x):
    """Trace-time dtype dispatch: integer frames are normalized to [0,1]
    float32 ON DEVICE, so host->device transfers stay 1 (uint8) or
    2 (uint16) bytes/pixel instead of the 4 bytes/pixel a host-side
    ``astype(float32)/maxv`` costs. Float inputs are assumed already
    normalized and pass through unchanged."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    return x.astype(jnp.float32)


def _resize_to(x, hw):
    if hw is not None and (x.shape[1], x.shape[2]) != tuple(hw):
        x = jax.image.resize(x, (x.shape[0], hw[0], hw[1], 3),
                             method="cubic")
    return x


def _topk_compact(preds, k: int, pos_thre):
    """Device-side candidate compaction: keep only the top-k rows by
    objectness ([B, k, 5+nc]) plus the per-image count of rows at or
    above pos_thre. The full decoded tensor is [B, N, 5+nc] with
    N ≈ 6300 at 320x320 — fetching it to host costs ~25x more
    device->host bandwidth than the compacted top-k, and on a
    tunneled/synchronous link that readback dominates the whole
    batched-inference pass. The count lets the host detect (and warn
    about) the rare crop with more above-threshold candidates than k."""
    obj = preds[..., 4]
    _, idx = jax.lax.top_k(obj, k)
    sel = jnp.take_along_axis(preds, idx[..., None], axis=1)
    n_above = jnp.sum(obj >= pos_thre, axis=-1, dtype=jnp.int32)
    return sel, n_above


@functools.partial(jax.jit, static_argnames=("nc", "apply", "hw"))
def _forward_decode(variables, imgs, nc: int, apply, hw=None):
    """imgs: [B, H, W, 3] uint8/uint16/float32 -> decoded [B, N, 5+nc]
    (normalize + optional resize to hw + forward, all fused in one jit)."""
    heads = apply(variables, _resize_to(_unit_f32(imgs), hw))
    return yolov5.decode_predictions(heads, nc)


@functools.partial(jax.jit, static_argnames=("nc", "apply", "k", "hw"))
def _forward_decode_topk(variables, imgs, nc: int, apply, k: int,
                         pos_thre, hw=None):
    """Forward + decode + top-k compaction (see _topk_compact)."""
    x = _resize_to(_unit_f32(imgs), hw)
    preds = yolov5.decode_predictions(apply(variables, x), nc)
    return _topk_compact(preds, k, pos_thre)


@functools.partial(jax.jit, static_argnames=("tiles", "hw", "nc", "apply",
                                             "k", "transpose"))
def _tiles_forward_topk(variables, imgs, tiles, hw, nc: int, apply, k: int,
                        pos_thre, transpose: bool = False):
    """Device-resident pyramid level: imgs [B, H, W, 3] (u8/u16/f32,
    already in HBM) -> compacted candidates for every (image, tile) pair.

    The tile crops are static slices fused into the same XLA program as
    normalization, the cubic resize, the YOLO forward and the top-k
    compaction — nothing but the [B*T, k, 5+nc] candidates ever leaves
    the device. Crop order is image-major (image 0 tiles, image 1
    tiles, ...) to match the host path's np.stack loop."""
    x = _unit_f32(imgs)
    if transpose:
        x = jnp.transpose(x, (0, 2, 1, 3))
    crops = jnp.stack([x[:, y0:y0 + hs, x0:x0 + ws]
                       for (y0, x0, hs, ws) in tiles], axis=1)
    bt = crops.shape[0] * crops.shape[1]
    crops = _resize_to(
        crops.reshape(bt, crops.shape[2], crops.shape[3], 3), hw)
    preds = yolov5.decode_predictions(apply(variables, crops), nc)
    return _topk_compact(preds, k, pos_thre)


@functools.partial(jax.jit, static_argnames=("top_k",))
def _nms_batch(boxes, scores, score_thre, nms_thre, top_k: int = 128):
    """Vmapped greedy NMS over padded per-image candidate sets:
    boxes [B, N, 4], scores [B, N] -> (order [B, K], keep [B, K])."""
    return jax.vmap(
        lambda b, s: nms_xyxy(b, s, score_thre, nms_thre, top_k))(boxes,
                                                                  scores)


@functools.partial(jax.jit, static_argnames=("pos_thre", "nms_thre"))
def _sel_nms_device(sel, *, pos_thre, nms_thre):
    """Fused xywh->xyxy + batched NMS chained on the dispatched top-k
    candidates: order/keep ride the SAME grouped readback as ``sel``
    instead of collect fetching sel, re-uploading host-built boxes and
    fetching the NMS result -- 2 extra round trips per block on the
    tunneled chip (the box math is bit-identical: x2 = w + (x - w/2) in
    f32 either way)."""
    x1 = sel[..., 0] - sel[..., 2] / 2
    y1 = sel[..., 1] - sel[..., 3] / 2
    boxes = jnp.stack([x1, y1, x1 + sel[..., 2], y1 + sel[..., 3]],
                      axis=-1)
    return _nms_batch(boxes, sel[..., 4], pos_thre, nms_thre)


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_kept_device(sel, order, keep, cap: int):
    """Gather the NMS-kept rows of a whole block into one fixed-cap
    buffer, so the readback is O(detections), not O(B * topk_readback).

    The un-compacted single-scale readback is [B, k, 5+nc] f32 sel plus
    [B, K] order/keep -- ~850 KB per 64-frame block at k=256 -- of which
    the host postprocess keeps only order[keep] rows (a handful per
    block). On the tunneled chip that readback ran at ~5 MB/s and was
    the dldet e2e bound (collect_fetch_s 1.43 of 2.13 s wall, r5).

    Box math is bit-identical to _postprocess_batch_nms: xywh->xyxy in
    f32 before any scaling, and rows appear in the same per-image order
    (order positions are already score-sorted by the NMS).

    Returns:
      packed  [cap, 5 + (5+nc) - 4]: per kept row
              (owner_image, x1, y1, x2, y2, obj, cls...) f32, rows
              owner-major in NMS order; tail rows zero.
      counts  [B] int32 kept rows per image (pre-cap).
      total   [] int32 total kept rows (pre-cap; > cap means truncated).
    """
    b, k, d = sel.shape
    rows = jnp.take_along_axis(sel, order[..., None], axis=1)  # [B, K, d]
    x1 = rows[..., 0] - rows[..., 2] / 2
    y1 = rows[..., 1] - rows[..., 3] / 2
    boxes = jnp.stack([x1, y1, x1 + rows[..., 2], y1 + rows[..., 3]],
                      axis=-1)
    kk = order.shape[1]
    owner = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.float32)[:, None], (b, kk))
    payload = jnp.concatenate(
        [owner[..., None], boxes, rows[..., 4:]], axis=-1)  # [B, K, 1+1+nc+4]
    payload = payload.reshape(b * kk, -1)
    flat_keep = keep.reshape(-1)
    pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
    total = jnp.sum(flat_keep.astype(jnp.int32))
    # overflow rows (and non-kept rows) land in a discarded slot
    tgt = jnp.where(flat_keep & (pos < cap), pos, cap)
    packed = jnp.zeros((cap + 1, payload.shape[1]), jnp.float32)
    packed = packed.at[tgt].set(payload, mode="drop")[:cap]
    counts = jnp.sum(keep.astype(jnp.int32), axis=1)
    return packed, counts, total


_WEIGHT_CACHE: dict = {}


@functools.lru_cache(maxsize=None)
def _shared_module(nc: int) -> "yolov5.YOLOv5":
    """One flax module instance per architecture config, shared by every
    YOLOModel in the process.

    Flax modules are stateless and value-equal, but their BOUND ``apply``
    methods are not (two equal YOLOv5(nc=9) instances hash equal while
    ``a.apply != b.apply``) -- and ``apply`` is a static jit argument of
    every forward above, so a fresh module per YOLOModel instance made
    every new detector/exporter/pass RECOMPILE the whole network (~25-35 s
    per recompile through the remote-compile relay; measured as an 83%
    recheck-ON e2e overhead and the dldet bench's 20 fps ceiling, r4).
    Sharing the instance makes the jit caches hit across YOLOModel
    lifetimes."""
    return yolov5.YOLOv5(nc=nc)


class YOLOModel:
    """YOLO detector with Flax/XLA backend."""

    def __init__(self, weight_path: str, dtype: str = "bfloat16",
                 nms: bool = False, warmup: bool = True,
                 pos_thre: float = 0.25, nms_thre: float = 0.45,
                 multiscale_pred: int = 1, multiscale_partition: int = 2,
                 hw_tolerance: float = 0.2,
                 logger: Optional[BaseMetLog] = None,
                 input_hw: tuple[int, int] = DEFAULT_INPUT_HW) -> None:
        self.logger = logger or get_default_logger()
        hw_env = os.environ.get("METDETPY_TPU_YOLO_HW")
        if hw_env:
            h, w = hw_env.lower().split("x")
            input_hw = (int(h), int(w))
        self.nms = nms
        self.pos_thre = pos_thre
        self.nms_thre = nms_thre
        self.multiscale_pred = multiscale_pred
        self.multiscale_partition = multiscale_partition
        self.hw_tolerance = hw_tolerance
        self.h, self.w = input_hw
        self.c = 3
        self.topk_readback = int(
            os.environ.get("METDETPY_TPU_YOLO_TOPK", 256))
        # block-wide kept-row budget for the compacted single-scale
        # readback (_compact_kept_device); kept rows past it are dropped
        # with a warning (the batched NMS already caps at 128/image)
        self.compact_cap = int(
            os.environ.get("METDETPY_TPU_YOLO_COMPACT_CAP", 512))
        self.nc = get_num_class() - 2  # without DROPPED/OTHERS
        self.hw_ratio = self.h / self.w

        self.model = _shared_module(self.nc)
        self.variables = self._load_weights(weight_path)
        self._apply = self.model.apply
        if warmup:
            _ = self._batched_forward(
                np.zeros((1, self.h, self.w, 3), np.float32))
        self.logger.info(
            f"Loaded YOLOv5s (Flax) on {jax.devices()[0].platform} from "
            f"{weight_path!r}.")

    # ------------------------------------------------------------------

    def _load_weights(self, weight_path: str):
        if weight_path and weight_path.endswith(".npz") and \
                os.path.isfile(weight_path) and not is_lfs_pointer(
                    weight_path):
            # process-level cache of DEVICE-resident params: without it
            # every YOLOModel instance (one per detect_video pass via
            # MetExporter/MLDetector) re-parses the npz and re-uploads
            # ~14 MB of weights through the link -- measured as seconds
            # per pass on a slow transport
            key = (os.path.abspath(weight_path),
                   os.path.getmtime(weight_path))
            cached = _WEIGHT_CACHE.get(key)
            if cached is None:
                cached = jax.device_put(load_params(weight_path))
                _WEIGHT_CACHE[key] = cached
            return cached
        if weight_path and weight_path.endswith(".onnx") and \
                os.path.isfile(weight_path) and not is_lfs_pointer(
                    weight_path):
            try:
                self.logger.info("Converting ONNX weights to Flax...")
                return convert_onnx(weight_path)
            except ImportError as e:
                self.logger.warning(f"{e}")
        self.logger.warning(
            f"Weight file {weight_path!r} missing/unreadable (the reference "
            "repo ships it only as a Git-LFS pointer); using deterministic "
            "random initialization. Detection quality will be meaningless "
            "until real weights are provided (convert with "
            "metdetpy_tpu.models.weights.convert_onnx).")
        _, variables = yolov5.init_params(nc=self.nc,
                                          input_hw=(self.h, self.w))
        return variables

    @property
    def input_shape(self):
        return [[1, self.c, self.h, self.w]]

    @property
    def device(self) -> str:
        return jax.devices()[0].platform

    # ------------------------------------------------------------------

    def _batched_forward(self, imgs: np.ndarray) -> np.ndarray:
        """imgs: [B, h, w, 3] uint8/uint16 (or float32 in [0,1]);
        normalized + resized on device to the model resolution; returns
        [B, N, 5+nc] float32 numpy."""
        out = _forward_decode(self.variables, jnp.asarray(imgs), self.nc,
                              self._apply, hw=(self.h, self.w))
        return np.asarray(out, dtype=np.float32)

    def _k_budget(self) -> int:
        n_anchors = 3 * sum((self.h // s) * (self.w // s)
                            for s in (8, 16, 32))
        return min(self.topk_readback, n_anchors)

    def _warn_truncated(self, n_above, k: int) -> None:
        n_above = np.asarray(n_above)
        if (n_above > k).any():
            self.logger.warning(
                f"top-k readback truncated {int((n_above > k).sum())} "
                f"crop(s) with >{k} above-threshold candidates; raise "
                f"METDETPY_TPU_YOLO_TOPK to keep them all.")

    def _batched_forward_topk(self, imgs: np.ndarray) -> np.ndarray:
        """Like _batched_forward, but reads back only the top-k
        candidates per image by objectness (device-compacted; see
        _topk_compact). Used by the multiscale tile loop, where the
        host immediately discards sub-threshold rows anyway."""
        k = self._k_budget()
        sel, n_above = _forward_decode_topk(
            self.variables, jnp.asarray(imgs), self.nc, self._apply, k,
            self.pos_thre, hw=(self.h, self.w))
        self._warn_truncated(n_above, k)
        return np.asarray(sel, dtype=np.float32)

    def _tiles_topk(self, imgs_dev, tiles, transpose: bool) -> np.ndarray:
        """Device-resident tiled forward over a [B, H, W, 3] jax array
        (see _tiles_forward_topk); returns [B*T, k, 5+nc] numpy."""
        k = self._k_budget()
        sel, n_above = _tiles_forward_topk(
            self.variables, imgs_dev, tuple(tiles), (self.h, self.w),
            self.nc, self._apply, k, self.pos_thre, transpose)
        self._warn_truncated(n_above, k)
        return np.asarray(sel, dtype=np.float32)

    def _postprocess_single(self, pred: np.ndarray, scale_wh: tuple[float,
                                                                    float]):
        """pred [N, 5+nc] xywh+obj+cls at model scale -> (boxes xyxy int,
        cls scores) at input scale."""
        boxes = pred[:, :4].copy()
        boxes[:, 0] -= boxes[:, 2] / 2
        boxes[:, 1] -= boxes[:, 3] / 2
        boxes[:, 2] += boxes[:, 0]
        boxes[:, 3] += boxes[:, 1]
        conf = pred[:, 4]
        if self.nms:
            order, keep = nms_xyxy(jnp.asarray(boxes), jnp.asarray(conf),
                                   self.pos_thre, self.nms_thre)
            idx = np.asarray(order)[np.asarray(keep)]
            boxes, pred = boxes[idx], pred[idx]
        sw, sh = scale_wh
        boxes[:, 0] *= sw
        boxes[:, 2] *= sw
        boxes[:, 1] *= sh
        boxes[:, 3] *= sh
        result_pos = boxes.astype(int)
        # sqrt score correction (reference MetLib/model.py:293-294)
        result_cls = np.sqrt(np.einsum("ab,a->ab", pred[:, 5:], pred[:, 4]))
        # drop degenerate boxes (decoded w/h rounds below one pixel)
        ok = ((result_pos[:, 2] - result_pos[:, 0] >= 1)
              & (result_pos[:, 3] - result_pos[:, 1] >= 1))
        return result_pos[ok], result_cls[ok]

    def _forward_tiles(self, x: np.ndarray, tiles: list[tuple[int, int, int,
                                                              int]]):
        """Run a batch of same-size crops through one forward; offset boxes
        back to image coordinates."""
        batch = np.stack([x[y0:y0 + hs, x0:x0 + ws]
                          for (y0, x0, hs, ws) in tiles])
        # with NMS on, sub-top-k rows are score-filtered anyway -- read
        # back only the compacted candidates (see _forward_decode_topk);
        # nms=False callers get every anchor row, unfiltered
        preds = (self._batched_forward_topk(batch) if self.nms
                 else self._batched_forward(batch))
        all_pos, all_cls = [], []
        hs, ws = tiles[0][2], tiles[0][3]
        scale = (ws / self.w, hs / self.h)
        for k, (y0, x0, _, _) in enumerate(tiles):
            pos, cls = self._postprocess_single(preds[k], scale)
            pos[:, [0, 2]] += x0
            pos[:, [1, 3]] += y0
            all_pos.append(pos)
            all_cls.append(cls)
        return all_pos, all_cls

    def _plan_tiles(self, h: int, w: int):
        """Multiscale tile plan for an [h, w] image: (transpose_flag,
        levels), each level a list of same-shape (y0, x0, hs, ws) tiles
        (reference tiling scheme MetLib/model.py:297-400; origins clamped so
        the whole level runs as one stackable batch)."""
        transpose_flag = False
        input_hw_ratio = h / w
        h_rep, w_rep = 1, 1
        if abs(self.hw_ratio - input_hw_ratio) > self.hw_tolerance:
            if ((input_hw_ratio - 1) * (self.hw_ratio - 1)) > 0 or abs(
                    self.hw_ratio - 1 / input_hw_ratio) < self.hw_tolerance:
                transpose_flag = True
                input_hw_ratio = 1 / input_hw_ratio
                h, w = w, h
            if h > w:
                h_rep = int(np.ceil(h * self.w / (self.h * w)))
            else:
                w_rep = int(np.ceil(w * self.h / (h * self.w)))
        levels = []
        for scale in range(self.multiscale_pred):
            if scale > 0:
                h_rep *= self.multiscale_partition
                w_rep *= self.multiscale_partition
            tot_h = (h_rep - 1) * PARTITION_MIN_OVERLAP
            tot_w = (w_rep - 1) * PARTITION_MIN_OVERLAP
            h_size = min(int(h // (h_rep - tot_h)), h)
            w_size = min(int(w // (w_rep - tot_w)), w)
            h_stride = int(h // (h_rep + tot_h))
            w_stride = int(w // (w_rep + tot_w))
            levels.append([(min(i * h_stride, h - h_size),
                            min(j * w_stride, w - w_size), h_size, w_size)
                           for i in range(h_rep) for j in range(w_rep)])
        return transpose_flag, levels

    def forward(self, x: np.ndarray):
        """Multiscale inference on one [H, W(, C)] uint8/uint16 image
        (grayscale expanded, alpha dropped)."""
        assert isinstance(x, np.ndarray) and x.ndim in (2, 3)
        x = _ensure_3ch(x)
        h, w, c = x.shape
        assert c == self.c, "channel count must match"
        if x.dtype not in (np.uint8, np.uint16):
            x = x.astype(np.float32) / 255.0  # u8/u16 normalize on device

        if self.multiscale_pred == 0:
            pred = self._batched_forward(x[None])[0]
            return self._postprocess_single(pred, (w / self.w, h / self.h))

        transpose_flag, levels = self._plan_tiles(h, w)
        if transpose_flag:
            x = np.transpose(x, (1, 0, 2))

        result_pos: list[np.ndarray] = []
        result_cls: list[np.ndarray] = []
        for tiles in levels:
            # per-level failure recovery (the batched analog of the
            # reference's per-tile exception skip, MetLib/model.py:374-383):
            # a failing pyramid level loses only that level's tiles -- the
            # results already accumulated are still returned
            try:
                pos_list, cls_list = self._forward_tiles(x, tiles)
            except Exception as e:
                self.logger.error(
                    f"Exception {e!r} encountered with calling "
                    f"{self.__class__.__name__}. Results of this pyramid "
                    f"level could be lost...")
                continue
            result_pos.extend(pos_list)
            result_cls.extend(cls_list)

        if not result_pos:
            return (np.zeros((0, 4), dtype=int),
                    np.zeros((0, self.nc), dtype=np.float64))
        pos = np.concatenate(result_pos, axis=0)
        cls = np.concatenate(result_cls, axis=0)
        if len(pos) > 0:
            order, keep = nms_xyxy(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(np.max(cls, axis=-1)),
                                   self.pos_thre,
                                   MULTISCALE_NMS_OVERLAP_THRE)
            idx = np.asarray(order)[np.asarray(keep)]
            pos, cls = pos[idx], cls[idx]
        if transpose_flag:
            pos = pos[:, [1, 0, 3, 2]]
        return pos, cls

    MAX_BATCH_CANDIDATES = 128  # per-image candidate budget for batched NMS

    def forward_batch(self, imgs: np.ndarray) -> list:
        """Batched multiscale inference on [B, H, W, 3] uint8/uint16 images.

        The block-path used by MLDetector: every pyramid level of every
        image runs in ONE device forward, and the final per-image NMS is a
        single vmapped device call -- on a tunneled TPU this turns ~3B
        device round trips into ~(levels + 1). Per-tile pre-NMS is skipped
        (the stricter global multiscale NMS at IoU 0.1 subsumes it), so box
        sets can differ from forward() in which member of a duplicate
        cluster survives.
        """
        assert imgs.ndim in (3, 4)
        if imgs.ndim == 3 or imgs.shape[-1] != self.c:
            imgs = np.stack([_ensure_3ch(im) for im in imgs])
        b, h, w, _ = imgs.shape
        if b == 0:
            return []
        x = (imgs if imgs.dtype in (np.uint8, np.uint16)
             else imgs.astype(np.float32) / 255.0)  # ints normalize on device
        if self.multiscale_pred == 0 or not self.nms:
            # nms=False keeps forward()'s exact (unfiltered) semantics
            preds = self._batched_forward(x)
            return [self._postprocess_single(preds[k],
                                             (w / self.w, h / self.h))
                    for k in range(b)]

        transpose_flag, levels = self._plan_tiles(h, w)
        if transpose_flag:
            x = np.transpose(x, (0, 2, 1, 3))

        per_pos = [[] for _ in range(b)]
        per_cls = [[] for _ in range(b)]
        for tiles in levels:
            hs, ws = tiles[0][2], tiles[0][3]
            crops = np.stack([x[k, y0:y0 + hs, x0:x0 + ws]
                              for k in range(b) for (y0, x0, _, _) in tiles])
            preds = self._batched_forward_topk(crops)
            self._accum_level(preds, tiles, b, per_pos, per_cls)
        return self._finalize_batch(per_pos, per_cls, b, transpose_flag)

    def forward_batch_device(self, imgs_dev) -> list:
        """forward_batch for a [B, H, W, 3] uint8/uint16 jax array already
        resident in HBM (e.g. MLDetector's window-max stacks): tiling,
        normalization, resize, forward and candidate compaction all run
        on device and only the compacted top-k rows (plus the vmapped NMS
        verdicts) ever cross the link — the stacks are never read back.
        Results match ``forward_batch(np.asarray(imgs_dev))`` exactly.
        (The reference fetches every stack to host and runs one
        onnxruntime call per tile, MetLib/Detector.py:522-573 +
        model.py:341-383.)"""
        if not self.nms:
            # full-anchor-row semantics require every row on host anyway
            return self.forward_batch(np.asarray(imgs_dev))
        if imgs_dev.shape[0] == 0:
            return []
        return self.collect_batch_device(self.dispatch_batch_device(
            imgs_dev))

    def dispatch_batch_device(self, imgs_dev):
        """Dispatch-only half of forward_batch_device: enqueues every
        pyramid level's fused device program (jax dispatch is async) and
        returns an opaque handle of device arrays. Finish with
        collect_batch_device — the pair lets a block pipeline overlap
        block N's host postprocess with block N+1's device compute."""
        if not self.nms:
            raise NotImplementedError(
                "device-resident dispatch requires nms=True")
        b, h, w, c = imgs_dev.shape
        assert c == self.c, "channel count must match"
        if imgs_dev.dtype not in (np.uint8, np.uint16):
            # match forward_batch's host semantics for float inputs
            # (divide by 255); u8/u16 normalize inside the fused jits
            imgs_dev = imgs_dev.astype(jnp.float32) / 255.0
        k = self._k_budget()
        single_scale = self.multiscale_pred == 0
        if single_scale:
            transpose_flag, levels = False, [((0, 0, h, w),)]
        else:
            transpose_flag, levels = self._plan_tiles(h, w)
        outs = []
        for tiles in levels:
            sel, n_above = _tiles_forward_topk(
                self.variables, imgs_dev, tuple(tiles), (self.h, self.w),
                self.nc, self._apply, k, self.pos_thre, transpose_flag)
            if single_scale:
                # single-scale NMS needs no cross-level accumulation, so
                # it fuses into the dispatch chain, and the kept rows are
                # compacted across the block so the readback is
                # O(detections) (see _compact_kept_device)
                order, keep = _sel_nms_device(sel, pos_thre=self.pos_thre,
                                              nms_thre=self.nms_thre)
                packed, counts, total = _compact_kept_device(
                    sel, order, keep, self.compact_cap)
                outs.append((tiles, packed, counts, total, n_above))
            else:
                outs.append((tiles, sel, n_above))
        return ("compact" if single_scale else False, b, h, w,
                transpose_flag, k, outs)

    def collect_batch_device(self, handle) -> list:
        """Blocking half of dispatch_batch_device: fetch the compacted
        candidates (one small transfer per level) and run the host-side
        accumulation + the single vmapped NMS."""
        single_scale, b, h, w, transpose_flag, k, outs = handle
        self._last_compact_rowidx = None
        if single_scale == "compact":
            (_, packed, counts, total, n_above), = outs
            self._warn_truncated(n_above, k)
            return self._unpack_compact(
                np.asarray(packed, dtype=np.float32),
                np.asarray(counts), int(np.asarray(total)), b,
                (w / self.w, h / self.h))
        if single_scale:
            (_, sel, n_above, order, keep), = outs
            self._warn_truncated(n_above, k)
            return self._postprocess_batch_nms(
                np.asarray(sel, dtype=np.float32),
                (w / self.w, h / self.h),
                order_keep=(np.asarray(order), np.asarray(keep)))
        per_pos = [[] for _ in range(b)]
        per_cls = [[] for _ in range(b)]
        for tiles, sel, n_above in outs:
            self._warn_truncated(n_above, k)
            self._accum_level(np.asarray(sel, dtype=np.float32), tiles, b,
                              per_pos, per_cls)
        return self._finalize_batch(per_pos, per_cls, b, transpose_flag)

    def _unpack_compact(self, packed: np.ndarray, counts: np.ndarray,
                        total: int, b: int, scale_wh):
        """Host half of _compact_kept_device: split the packed kept rows
        back into per-image (boxes, cls) with math bit-identical to
        _postprocess_batch_nms (f32 scale, then int cast, then the
        degenerate-box filter and sqrt(cls*obj) scores)."""
        if total > len(packed):
            self.logger.warning(
                f"compacted readback truncated {total - len(packed)} "
                f"kept row(s); raise METDETPY_TPU_YOLO_COMPACT_CAP.")
        sw, sh = scale_wh
        n = min(total, len(packed))
        ends = np.minimum(np.cumsum(counts), n)
        starts = np.concatenate(([0], ends[:-1]))
        out = []
        # side channel: global packed-row index per surviving row, read
        # by MLDetector right after collect to join the device-computed
        # orientation triples (which are indexed by packed row)
        self._last_compact_rowidx = []
        for i in range(b):
            rows = packed[starts[i]:ends[i]]
            bx = rows[:, 1:5].copy()
            bx[:, [0, 2]] *= sw
            bx[:, [1, 3]] *= sh
            result_pos = bx.astype(int)
            p = rows[:, 5:]
            result_cls = np.sqrt(np.einsum("ab,a->ab", p[:, 1:], p[:, 0]))
            ok = ((result_pos[:, 2] - result_pos[:, 0] >= 1)
                  & (result_pos[:, 3] - result_pos[:, 1] >= 1))
            self._last_compact_rowidx.append(
                np.arange(starts[i], ends[i])[ok])
            out.append((result_pos[ok], result_cls[ok]))
        return out

    def _postprocess_batch_nms(self, preds: np.ndarray, scale_wh,
                               order_keep=None):
        """Batched _postprocess_single (nms=True): one vmapped device NMS
        round trip for the whole block instead of one nms_xyxy dispatch
        per image; with ``order_keep`` the NMS already ran fused in the
        dispatch chain (_sel_nms_device) and no device access happens
        here. preds: [B, N, 5+nc] xywh+obj+cls at model scale."""
        b = preds.shape[0]
        boxes = preds[:, :, :4].copy()
        boxes[:, :, 0] -= boxes[:, :, 2] / 2
        boxes[:, :, 1] -= boxes[:, :, 3] / 2
        boxes[:, :, 2] += boxes[:, :, 0]
        boxes[:, :, 3] += boxes[:, :, 1]
        if order_keep is None:
            order, keep = _nms_batch(jnp.asarray(boxes),
                                     jnp.asarray(preds[:, :, 4]),
                                     self.pos_thre, self.nms_thre)
            order = np.asarray(order)
            keep = np.asarray(keep)
        else:
            order, keep = order_keep
        sw, sh = scale_wh
        out = []
        for k in range(b):
            idx = order[k][keep[k]]
            bx, p = boxes[k][idx], preds[k][idx]
            bx[:, [0, 2]] *= sw
            bx[:, [1, 3]] *= sh
            result_pos = bx.astype(int)
            result_cls = np.sqrt(
                np.einsum("ab,a->ab", p[:, 5:], p[:, 4]))
            ok = ((result_pos[:, 2] - result_pos[:, 0] >= 1)
                  & (result_pos[:, 3] - result_pos[:, 1] >= 1))
            out.append((result_pos[ok], result_cls[ok]))
        return out

    def _accum_level(self, preds: np.ndarray, tiles, b: int, per_pos,
                     per_cls) -> None:
        """Host-side candidate accumulation for one pyramid level (shared
        by the host-crop and device-resident paths; preds is image-major
        [b*T, k, 5+nc] at model scale)."""
        hs, ws = tiles[0][2], tiles[0][3]
        sw, sh = ws / self.w, hs / self.h
        idx = 0
        for k in range(b):
            for (y0, x0, _, _) in tiles:
                p = preds[idx]
                idx += 1
                m = p[:, 4] >= self.pos_thre
                if not m.any():
                    continue
                p = p[m]
                boxes = p[:, :4].copy()
                boxes[:, 0] -= boxes[:, 2] / 2
                boxes[:, 1] -= boxes[:, 3] / 2
                boxes[:, 2] += boxes[:, 0]
                boxes[:, 3] += boxes[:, 1]
                boxes[:, [0, 2]] = boxes[:, [0, 2]] * sw + x0
                boxes[:, [1, 3]] = boxes[:, [1, 3]] * sh + y0
                per_pos[k].append(boxes.astype(int))
                per_cls[k].append(np.sqrt(
                    np.einsum("ab,a->ab", p[:, 5:], p[:, 4])))

    def _finalize_batch(self, per_pos, per_cls, b: int,
                        transpose_flag: bool) -> list:
        """Cap candidates, run the global multiscale NMS (one vmapped
        device call) and unpack per-image (boxes, cls) results."""
        cap = self.MAX_BATCH_CANDIDATES
        cand_pos = np.zeros((b, cap, 4), np.float32)
        cand_scr = np.full((b, cap), -1.0, np.float32)
        kept_pos = [np.zeros((0, 4), int)] * b
        kept_cls = [np.zeros((0, self.nc), np.float32)] * b
        counts = np.zeros(b, int)
        cls_store: list[np.ndarray] = [None] * b
        pos_store: list[np.ndarray] = [None] * b
        for k in range(b):
            if not per_pos[k]:
                continue
            pos = np.concatenate(per_pos[k])
            cls = np.concatenate(per_cls[k])
            scr = np.max(cls, axis=-1)
            if len(pos) > cap:
                top = np.argsort(-scr)[:cap]
                pos, cls, scr = pos[top], cls[top], scr[top]
            n = len(pos)
            cand_pos[k, :n] = pos
            cand_scr[k, :n] = scr
            counts[k] = n
            pos_store[k], cls_store[k] = pos, cls
        if counts.any():
            order, keep = _nms_batch(jnp.asarray(cand_pos),
                                     jnp.asarray(cand_scr),
                                     self.pos_thre,
                                     MULTISCALE_NMS_OVERLAP_THRE)
            order = np.asarray(order)
            keep = np.asarray(keep)
            for k in range(b):
                if counts[k] == 0:
                    continue
                sel = order[k][keep[k] & (order[k] < counts[k])]
                p = pos_store[k][sel].astype(int)
                ok = ((p[:, 2] - p[:, 0] >= 1) & (p[:, 3] - p[:, 1] >= 1))
                kept_pos[k] = p[ok]
                kept_cls[k] = cls_store[k][sel][ok]
        if transpose_flag:
            kept_pos = [p[:, [1, 0, 3, 2]] if len(p) else p
                        for p in kept_pos]
        return list(zip(kept_pos, kept_cls))
