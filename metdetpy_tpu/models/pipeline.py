"""Dispatch/collect pipelining for batched photo inference.

On a tunneled/synchronous TPU link every batched forward pays a full
round trip; ``BatchPipeline`` keeps up to ``inflight`` batches pending
by dispatching batch N+1's device work (jax dispatch is async) before
collecting batch N's results, so upload + device compute overlap the
host postprocess of the previous batch. With ``inflight=0`` it
degenerates to the synchronous call order (used by interactive --visu
mode, which wants per-image display).

The device path rides YOLOModel.dispatch_batch_device /
collect_batch_device (bit-exact vs forward_batch); models that cannot
run device-resident (nms=False) fall back to a synchronous
forward_batch per submit. (The reference has no analog: it runs one
onnxruntime session call per image under a global lock,
MetLib/model.py:341-383.)
"""

from __future__ import annotations

import collections

import numpy as np


class BatchPipeline:
    """Order-preserving dispatch/collect pipeline over batched YOLO
    inference. ``submit`` returns completed (tag, (boxes, cls)) pairs
    for batches pushed beyond the in-flight budget; ``drain`` flushes
    the rest."""

    def __init__(self, model, inflight: int = 1, sharding=None) -> None:
        """sharding: optional jax NamedSharding splitting the batch axis
        over a device mesh (see parallel.dataparallel.batch_sharding) —
        each chip then runs its own sub-batch of the same program."""
        self.model = model
        self.inflight = max(int(inflight), 0)
        self.sharding = sharding
        self._q: collections.deque = collections.deque()
        self._device_ok = True

    def _dispatch(self, imgs: np.ndarray):
        m = self.model
        if self._device_ok and getattr(m, "nms", False) and hasattr(
                m, "dispatch_batch_device"):
            import jax.numpy as jnp

            from .yolo import _ensure_3ch

            # mirror forward_batch's preconditions: photo folders load
            # with IMREAD_UNCHANGED, so grayscale (2-D) and RGBA frames
            # must be channel-normalized before the device path sees them
            x = imgs
            if x.ndim == 3 or x.shape[-1] != 3:
                x = np.stack([_ensure_3ch(im) for im in x])
            if self.sharding is not None:
                from ..parallel.dataparallel import put_batch_sharded
                # pad rows beyond the real batch are dropped by _collect's
                # zip against the (unpadded) tag list
                dev, _ = put_batch_sharded(np.asarray(x), self.sharding)
            else:
                dev = jnp.asarray(x)
            try:
                return True, m.dispatch_batch_device(dev)
            except NotImplementedError:
                self._device_ok = False
        return False, m.forward_batch(imgs)

    def _collect(self, entry) -> list:
        tags, is_dev, handle = entry
        outs = (self.model.collect_batch_device(handle) if is_dev
                else handle)
        return list(zip(tags, outs))

    def submit(self, tags: list, imgs: np.ndarray) -> list:
        """Dispatch one batch (tags are caller-opaque, one per image);
        collect and return batches now beyond the in-flight budget, in
        submission order."""
        is_dev, handle = self._dispatch(imgs)
        self._q.append((list(tags), is_dev, handle))
        done: list = []
        while len(self._q) > self.inflight:
            done.extend(self._collect(self._q.popleft()))
        return done

    def drain(self) -> list:
        """Collect every pending batch, in submission order."""
        done: list = []
        while self._q:
            done.extend(self._collect(self._q.popleft()))
        return done
