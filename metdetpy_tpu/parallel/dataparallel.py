"""Batch-data-parallel YOLO inference over a device mesh.

The reference's photo mode is a single onnxruntime session behind a
global lock (MetLib/model.py:142-166); here a folder scan scales over
every chip of a slice by sharding the image batch axis. The jitted
forward+decode+top-k programs have no cross-image ops (the only
cross-candidate op, NMS, is vmapped per image), so a ``NamedSharding``
on ``[B, H, W, 3]`` partitions the convolutions trivially — XLA inserts
no collectives at all and each chip runs its own sub-batch; only the
compacted per-image candidates are gathered back to host.

Validated on a virtual 8-device CPU mesh (tests/test_dataparallel.py +
__graft_entry__.dryrun_multichip); on real hardware the same sharding
rides a v5e slice unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from .mesh import build_mesh


def batch_sharding(n_devices: Optional[int] = None) -> NamedSharding:
    """NamedSharding that splits the leading (batch) axis over a 1-D
    mesh of up to n_devices devices (default: all visible devices)."""
    return NamedSharding(build_mesh(n_devices, axis_name="batch"),
                         PartitionSpec("batch"))


def put_batch_sharded(imgs: np.ndarray, sharding: NamedSharding):
    """Upload an image batch split over the mesh, padding the batch axis
    up to a multiple of the mesh size (sharded dims must divide evenly).

    Returns (device_array, n_real): results for rows >= n_real are
    padding and must be dropped by the caller."""
    n_real = imgs.shape[0]
    n_dev = sharding.mesh.devices.size
    rem = n_real % n_dev
    if rem:
        pad = np.repeat(imgs[-1:], n_dev - rem, axis=0)
        imgs = np.concatenate([imgs, pad], axis=0)
    return jax.device_put(imgs, sharding), n_real
