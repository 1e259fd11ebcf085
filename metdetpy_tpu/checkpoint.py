"""Checkpoint / resume for long-running (live-mode) detection.

The reference has no checkpointing (SURVEY.md §5.4 -- its closest analogs
are --start-time windows and MDRF intermediates). This subsystem snapshots
everything needed to resume a stream mid-run:

  - detector device carries (window/sub-ROI/dynamic-mask histories, EMA
    state, frame timer),
  - collector track state (every active/waiting MeteorSeries),
  - exporter output so far (SingleMDRecord list),
  - the merged-frame cursor.

Format: one .npz (arrays) + embedded json (structured state).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from .structs import SingleMDRecord, from_dict
from .track.series import MeteorSeries, PointList

CHECKPOINT_VERSION = 1


# ---------------------------------------------------------------------------
# Series (de)serialization
# ---------------------------------------------------------------------------


def series_state(ms: MeteorSeries) -> dict[str, Any]:
    return {
        "pts": ms.coord_list.pts.tolist(),
        "pts_frames": ms.coord_list.frame_num.tolist(),
        "centers": ms.center_list.pts.tolist(),
        "centers_frames": ms.center_list.frame_num.tolist(),
        "drct_list": list(ms.drct_list),
        "start_frame": int(ms.start_frame),
        "end_frame": int(ms.end_frame),
        "last_activate_frame": int(ms.last_activate_frame),
        "max_acti_frame": (None if np.isnan(ms.max_acti_frame)
                           else float(ms.max_acti_frame)),
        "max_acceptable_dist": (None if (isinstance(ms.max_acceptable_dist,
                                                    float)
                                         and np.isnan(ms.max_acceptable_dist))
                                else float(ms.max_acceptable_dist)),
        "count": int(ms.count),
        "cate_prob": (None if ms.cate_prob is None
                      else np.asarray(ms.cate_prob).tolist()),
        "fps": float(ms.fps),
        "runtime_length": int(ms.runtime_length),
        "range": [list(ms.range[0]), list(ms.range[1])],
    }


def series_from_state(state: dict[str, Any]) -> MeteorSeries:
    ms = MeteorSeries.__new__(MeteorSeries)
    ms.coord_list = PointList()
    ms.coord_list.pts = np.asarray(state["pts"], np.int32).reshape(-1, 2)
    ms.coord_list.frame_num = np.asarray(state["pts_frames"], np.int64)
    ms.center_list = PointList()
    ms.center_list.pts = np.asarray(state["centers"], np.int32).reshape(-1, 2)
    ms.center_list.frame_num = np.asarray(state["centers_frames"], np.int64)
    ms.drct_list = list(state["drct_list"])
    ms.start_frame = state["start_frame"]
    ms.end_frame = state["end_frame"]
    ms.last_activate_frame = state["last_activate_frame"]
    ms.max_acti_frame = (np.nan if state["max_acti_frame"] is None
                         else state["max_acti_frame"])
    ms.max_acceptable_dist = (np.nan
                              if state["max_acceptable_dist"] is None
                              else state["max_acceptable_dist"])
    ms.count = state["count"]
    ms.cate_prob = (None if state["cate_prob"] is None
                    else np.asarray(state["cate_prob"], np.float64))
    ms.fps = state["fps"]
    ms.runtime_length = state["runtime_length"]
    rng = state["range"]
    ms.range = (list(rng[0]), list(rng[1]))
    return ms


# ---------------------------------------------------------------------------
# Detector / collector state
# ---------------------------------------------------------------------------


def detector_state(detector) -> dict[str, np.ndarray]:
    """Device carries of a detector as host arrays (LineDetector window/
    EMA/dynamic-mask histories; MLDetector's rolling window-max carry)."""
    import jax
    if not hasattr(detector, "_gray_hist"):
        if hasattr(detector, "_hist"):  # MLDetector
            return {"ml_hist": np.asarray(detector._hist)}
        return {}  # stateless/unknown detector: re-warms after resume
    out = {
        "gray_hist": np.asarray(detector._gray_hist),
        "sub_hist": np.asarray(detector._sub_hist),
        "dy_hist": np.asarray(detector._dy_hist),
        "timer": np.asarray(detector.timer, np.int64),
    }
    for i, leaf in enumerate(jax.tree.leaves(detector._ema)):
        out[f"ema_{i}"] = np.asarray(leaf)
    if hasattr(detector, "_classic_hist"):
        out["classic_hist"] = np.asarray(detector._classic_hist)
    return out


def restore_detector(detector, arrays: dict[str, np.ndarray]) -> None:
    import jax
    import jax.numpy as jnp
    if "gray_hist" not in arrays:
        if "ml_hist" in arrays and hasattr(detector, "_hist"):
            detector._hist = jnp.asarray(arrays["ml_hist"])
        return
    detector._gray_hist = jnp.asarray(arrays["gray_hist"])
    detector._sub_hist = jnp.asarray(arrays["sub_hist"])
    detector._dy_hist = jnp.asarray(arrays["dy_hist"])
    detector.timer = int(arrays["timer"])
    detector._timer_dev = jnp.asarray(detector.timer, jnp.int32)
    leaves = [arrays[f"ema_{i}"]
              for i in range(len(jax.tree.leaves(detector._ema)))]
    detector._ema = jax.tree.unflatten(jax.tree.structure(detector._ema),
                                       [jnp.asarray(v) for v in leaves])
    if "classic_hist" in arrays and hasattr(detector, "_classic_hist"):
        detector._classic_hist = jnp.asarray(arrays["classic_hist"])


def collector_state(collector) -> dict[str, Any]:
    active = [series_state(ms) for ms in collector.active_meteor
              if ms is not collector._sentinel]
    waiting = [series_state(ms) for ms in collector.waiting_meteor]
    records = [rec.to_dict() for rec in collector.met_exporter.meteor_list]
    return {"active": active, "waiting": waiting, "records": records,
            "cur_frame": int(collector.cur_frame)}


def restore_collector(collector, state: dict[str, Any]) -> None:
    collector.active_meteor = (
        [series_from_state(s) for s in state["active"]]
        + [collector._sentinel])
    collector.waiting_meteor = [series_from_state(s)
                                for s in state["waiting"]]
    collector.met_exporter.meteor_list = [
        from_dict(SingleMDRecord, rec) for rec in state["records"]]
    collector.cur_frame = state["cur_frame"]


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, detector, collector,
                    merged_idx: int) -> None:
    arrays = detector_state(detector)
    meta = {
        "version": CHECKPOINT_VERSION,
        "merged_idx": int(merged_idx),
        "collector": collector_state(collector),
    }
    np.savez_compressed(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_checkpoint(path: str, detector, collector) -> int:
    """Restore detector + collector; returns the merged-frame cursor."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        assert meta["version"] == CHECKPOINT_VERSION, "checkpoint version"
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
    restore_detector(detector, arrays)
    restore_collector(collector, meta["collector"])
    return int(meta["merged_idx"])
