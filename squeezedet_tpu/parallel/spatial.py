"""Spatial (height-axis) sharding: the context-parallel analog for a CNN.

The reference has no sequence/context parallelism and none is needed at
KITTI scale (SURVEY §5) — but the TPU-native analog exists and is nearly
free to express: shard the image HEIGHT dimension over the mesh and let
XLA's SPMD partitioner insert the halo exchanges every 3x3 conv and
ceil-mode pool needs at shard boundaries. No hand-written collectives —
the same `_predict_batch` program, different in_shardings.

When to use: single-image (or tiny-batch) latency on a multi-chip slice,
where batch-axis data parallelism has nothing to split. With batch-axis
sharding a batch-1 predict leaves N-1 chips idle; height sharding splits
the 384-row feature map into contiguous row bands (48 rows/chip on 8
chips) that stay MXU-friendly down to the 24-row tail grid.

Parity: spatially-sharded predict equals the single-device output
bit-for-tolerance on the virtual 8-device mesh
(tests/test_multichip.py::test_spatial_sharded_predict_matches_single_device)
and is exercised by the driver's dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from squeezedet_tpu.parallel.mesh import DATA_AXIS
from squeezedet_tpu.parallel.train import TaskSpec, _predict_batch


def height_sharding(mesh) -> NamedSharding:
    """(B, H, W, C) images sharded on H; use with `jax.device_put`."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def make_spatial_predict_step(task: TaskSpec, mesh):
    """Predict step with the feature map height sharded over the mesh.

    Params/anchors replicated; images (B, H, W, C) sharded on axis 1; the
    fixed-shape detection outputs come back replicated. XLA inserts conv/
    pool halo exchanges and the gather at the head reshape automatically.
    """
    rep = NamedSharding(mesh, P())
    hsh = height_sharding(mesh)

    @partial(
        jax.jit,
        in_shardings=(rep, hsh, rep),
        out_shardings=rep,
    )
    def predict_step(params, images, anchors):
        return _predict_batch(params, images, anchors, task)

    return predict_step
