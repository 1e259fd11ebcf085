"""YOLOv5 weight persistence and ONNX conversion.

The reference ships weights/yolov5s{,_v2}.onnx (Git-LFS pointers in this
mount -- the real 28.7 MB files are absent, SURVEY.md §6). This module
provides:

  - npz save/load of the Flax parameter tree (the native weight format,
    ``*.flax.npz``),
  - a documented ONNX -> Flax converter (``convert_onnx``) that maps
    ultralytics state_dict initializer names (``model.N.*``) onto this
    package's module tree; it requires the ``onnx`` package, which is not
    installed in this environment, so the converter is exercised only where
    onnx is available,
  - deterministic random initialization as the in-environment fallback.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

# ultralytics layer index -> our module name
_LAYER_MAP = {
    0: "b0", 1: "b1", 2: "b2", 3: "b3", 4: "b4", 5: "b5", 6: "b6", 7: "b7",
    8: "b8", 9: "b9", 10: "h10", 13: "h13", 14: "h14", 17: "h17", 18: "h18",
    20: "h20", 21: "h21", 23: "h23",
}


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(variables: Any, path: str) -> None:
    np.savez(path, **flatten_tree(jax.device_get(variables)))


def load_params(path: str) -> dict:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})


def _assign_convbn(flat: dict, sd: dict, src: str, dst: str) -> None:
    """Map one ConvBNAct: torch OIHW conv weight -> flax HWIO kernel plus
    the four BN arrays."""
    flat[f"params/{dst}/conv/kernel"] = sd[f"{src}.conv.weight"].transpose(
        2, 3, 1, 0)
    flat[f"params/{dst}/bn/scale"] = sd[f"{src}.bn.weight"]
    flat[f"params/{dst}/bn/bias"] = sd[f"{src}.bn.bias"]
    flat[f"batch_stats/{dst}/bn/mean"] = sd[f"{src}.bn.running_mean"]
    flat[f"batch_stats/{dst}/bn/var"] = sd[f"{src}.bn.running_var"]


def _assign_c3(flat: dict, sd: dict, src: str, dst: str) -> None:
    for cv in ("cv1", "cv2", "cv3"):
        _assign_convbn(flat, sd, f"{src}.{cv}", f"{dst}/{cv}")
    i = 0
    while f"{src}.m.{i}.cv1.conv.weight" in sd:
        _assign_convbn(flat, sd, f"{src}.m.{i}.cv1", f"{dst}/m{i}/cv1")
        _assign_convbn(flat, sd, f"{src}.m.{i}.cv2", f"{dst}/m{i}/cv2")
        i += 1


def convert_onnx(onnx_path: str) -> dict:
    """Convert an ultralytics-exported yolov5s ONNX file to the Flax
    variable tree. Requires the ``onnx`` package."""
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:
        raise ImportError(
            "onnx is not installed; cannot convert ONNX weights. Provide a "
            "*.flax.npz file (save_params) or a torch checkpoint "
            "(convert_torch_checkpoint) instead.") from e
    model = onnx.load(onnx_path)
    sd = {init.name: numpy_helper.to_array(init)
          for init in model.graph.initializer}
    return convert_state_dict(sd)


def convert_torch_checkpoint(ckpt_path: str) -> dict:
    """Convert an ultralytics yolov5s torch checkpoint (.pt) to the Flax
    variable tree -- the alternative conversion path for environments with
    torch but no onnx (like this one)."""
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd_t = model.state_dict() if hasattr(model, "state_dict") else model
    sd = {k: np.asarray(v.float().numpy()) for k, v in sd_t.items()}
    return convert_state_dict(sd)


def convert_state_dict(sd: dict[str, np.ndarray]) -> dict:
    """Map an ultralytics yolov5s state dict (``model.N.*`` names, torch
    OIHW conv layout) onto this package's Flax module tree."""
    flat: dict[str, np.ndarray] = {}
    for idx, dst in _LAYER_MAP.items():
        src = f"model.{idx}"
        if f"{src}.conv.weight" in sd:                  # plain ConvBNAct
            _assign_convbn(flat, sd, src, dst)
        elif f"{src}.cv3.conv.weight" in sd:            # C3
            _assign_c3(flat, sd, src, dst)
        elif f"{src}.cv2.conv.weight" in sd:            # SPPF
            _assign_convbn(flat, sd, f"{src}.cv1", f"{dst}/cv1")
            _assign_convbn(flat, sd, f"{src}.cv2", f"{dst}/cv2")
        else:
            raise KeyError(f"cannot map ONNX layer {src}")
    for i in range(3):                                   # Detect heads
        flat[f"params/detect{i}/kernel"] = sd[
            f"model.24.m.{i}.weight"].transpose(2, 3, 1, 0)
        flat[f"params/detect{i}/bias"] = sd[f"model.24.m.{i}.bias"]
    return unflatten_tree(flat)


LFS_HEADER = b"version https://git-lfs.github.com/spec/v1"


def is_lfs_pointer(file_path: str, max_read: int = 4096) -> bool:
    if not os.path.isfile(file_path):
        return False
    with open(file_path, "rb") as f:
        data = f.read(max_read)
    return (data.lstrip().startswith(LFS_HEADER)
            or data.startswith(b"\xef\xbb\xbf" + LFS_HEADER))
