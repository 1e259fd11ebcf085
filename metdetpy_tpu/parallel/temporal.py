"""Temporal (sequence) sharding with halo exchange.

The reference's "long context" axis is frame time, handled by O(1) rolling
sums on one core (SURVEY.md §5.7). The TPU scale-out analog: shard a long
frame block's time axis across the mesh and exchange an (n-1)-frame halo
between neighboring shards over ICI (jax.lax.ppermute) so every position
still sees its full trailing window -- the only "context parallelism" this
domain needs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import windows
from .mesh import build_mesh


def temporal_window_stats(frames: np.ndarray, n: int,
                          mesh: Optional[Mesh] = None,
                          axis_name: str = "time"):
    """Rolling window max/mean over a time-sharded [T, H, W] block.

    Each shard holds T/S consecutive frames; the trailing n-1 frames of the
    left neighbor arrive via ppermute before the local rolling reduction.
    The first shard uses zero history (stream start).

    Returns WindowStats for all T positions (gathered).
    """
    mesh = mesh if mesh is not None else build_mesh(axis_name=axis_name)
    s = mesh.devices.size
    t_total, h, w = frames.shape
    assert t_total % s == 0, "T must divide the mesh size"
    assert t_total // s >= n - 1, (
        "each time shard must hold at least n-1 frames for the halo")

    def shard_fn(local_frames):
        local = local_frames  # [T/S, H, W] per shard (leading axis split)
        # send this shard's last n-1 frames to the right neighbor
        tail = local[-(n - 1):]
        perm = [(i, i + 1) for i in range(s - 1)]
        halo = jax.lax.ppermute(tail, axis_name, perm)
        idx = jax.lax.axis_index(axis_name)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        timer0 = idx.astype(jnp.int32) * local.shape[0]
        stats, _ = windows.window_stats(halo, local, n, timer0)
        return stats.win_max, stats.win_mean, stats.diff

    spec = P(axis_name)
    fn = jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=(spec,),
                           out_specs=(spec, spec, spec)))
    sharded = jax.device_put(frames, NamedSharding(mesh, spec))
    win_max, win_mean, diff = fn(sharded)
    return windows.WindowStats(win_max, win_mean, diff)
