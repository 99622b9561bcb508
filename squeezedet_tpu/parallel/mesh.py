"""Device mesh + sharding helpers.

The reference's only parallel strategy is single-process multi-GPU
DataParallel with explicit scatter/replicate/gather copies
(src/utils/data_parallel.py:93-113). The TPU-native equivalent is SPMD: one
1-D mesh over the batch axis, params replicated, batches sharded; `jax.jit`
partitions the program and XLA emits the gradient all-reduce over ICI.
No collectives are written by hand.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. ``num_devices`` 0 means all visible."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, batch: dict) -> dict:
    """device_put the array fields of a host batch with batch-axis sharding;
    host-only fields (image_metas, num_valid) pass through untouched."""
    sharding = batch_sharding(mesh)
    out = dict(batch)
    for key in ("image", "gt"):
        if key in batch:
            out[key] = jax.device_put(batch[key], sharding)
    return out


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated_sharding(mesh))
