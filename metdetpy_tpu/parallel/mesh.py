"""Device mesh helpers.

The reference has no distributed computing at all (SURVEY.md §2.4); this
package is the TPU-native replacement for its thread-pipeline concurrency:
jax.sharding meshes over ICI with shard_map + collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def build_mesh(n_devices: Optional[int] = None,
               axis_name: str = "stream") -> Mesh:
    """1-D mesh over up to n_devices devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def stream_sharding(mesh: Mesh, axis_name: str = "stream") -> NamedSharding:
    """Shard the leading (stream) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def force_cpu_devices(n_devices: int) -> bool:
    """Force an n-device CPU backend (for tests / dry runs on hosts whose
    sitecustomize pins a 1-chip TPU platform). Returns True on success;
    False if the backend was already initialized."""
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
        return True
    except RuntimeError:
        return False
