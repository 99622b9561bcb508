"""Deployment export: serialize the serving function to StableHLO.

The reference has no deployment story beyond "run this repo" — serving a
trained model means carrying the whole PyTorch stack. Here the entire
serving path (uint8 ingest + folded whitening + backbone + ConvDet +
on-device decode/top-K/NMS/threshold, i.e. exactly what
``engine/detector.Detector`` dispatches per batch) is one jitted pure
function, so ``jax.export`` can serialize it — weights baked in as
constants — to a portable StableHLO artifact loadable by any StableHLO
consumer (jax.export.deserialize, TF/XLA serving bridges, IREE) without
Python, the framework, or the checkpoint.

Artifact layout (<out>.stablehlo + <out>.json): the bytes are the
serialized exported function of one (B, H, W, 3) uint8 batch; the JSON
carries the input spec, class names, and filter thresholds a server needs.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def build_serving_fn(params, task, rgb_mean, rgb_std, anchors_np, uint8=True):
    """The standalone serving closure: batch -> fixed-shape detections.

    ``uint8=True`` (the default serving path) folds whitening into the stem
    conv so the function takes RAW uint8 batches; ``False`` exports the
    bit-parity float path (pre-whitened input)."""
    from squeezedet_tpu.models.squeezedet import fold_whitening
    from squeezedet_tpu.parallel.train import _predict_batch

    serve_params = (
        fold_whitening(params, rgb_mean, rgb_std) if uint8 else params
    )
    serve_params = jax.tree.map(jnp.asarray, serve_params)
    anchors = jnp.asarray(anchors_np)

    def serve(images):
        return _predict_batch(serve_params, images, anchors, task)

    return serve


def export_stablehlo(
    path_prefix: str,
    params,
    task,
    cfg_like: Any,
    batch_size: int,
    uint8: bool = True,
    platforms: list[str] | None = None,
    data_parallel: int = 0,
) -> str:
    """Serialize the serving function for a fixed batch size.

    ``cfg_like`` needs ``rgb_mean``, ``rgb_std``, ``anchors``,
    ``class_names``. ``platforms`` cross-compiles for other backends
    (e.g. ['tpu'] from a CPU host); default = the current backend.

    ``data_parallel=N`` exports the MESH-SHARDED serving step instead:
    the function is jitted over an N-device ``Mesh`` with the batch
    dimension sharded (weights replicated) — the same SPMD layout as
    ``parallel/train.make_predict_step``. jax.export records the mesh
    and shardings in the artifact (``nr_devices=N``); deserialize+call
    requires N devices and feeds each its batch shard, so one artifact
    serves a whole pod slice with zero per-host batching code.
    ``batch_size`` must divide by N. Returns the .stablehlo path."""
    from jax import export as jax_export

    serve = build_serving_fn(
        params, task, cfg_like.rgb_mean, cfg_like.rgb_std,
        np.asarray(cfg_like.anchors), uint8=uint8,
    )
    dtype = jnp.uint8 if uint8 else jnp.float32
    if data_parallel:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if batch_size % data_parallel:
            raise ValueError(
                f"batch_size {batch_size} must divide data_parallel "
                f"{data_parallel}"
            )
        devices = np.asarray(jax.devices()[:data_parallel])
        if devices.size < data_parallel:
            raise ValueError(
                f"data_parallel={data_parallel} but only {devices.size} "
                "devices visible"
            )
        mesh = Mesh(devices, ("data",))
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        jitted = jax.jit(serve, in_shardings=batch_sh,
                         out_shardings=batch_sh)
        spec = jax.ShapeDtypeStruct(
            (batch_size, *task.input_size, 3), dtype, sharding=batch_sh
        )
    else:
        jitted = jax.jit(serve)
        spec = jax.ShapeDtypeStruct(
            (batch_size, *task.input_size, 3), dtype
        )
    exported = jax_export.export(jitted, platforms=platforms)(spec)
    blob = exported.serialize()

    hlo_path = path_prefix + ".stablehlo"
    with open(hlo_path, "wb") as fp:
        fp.write(blob)
    meta = {
        "input": {
            "shape": [batch_size, *task.input_size, 3],
            "dtype": "uint8" if uint8 else "float32",
            "layout": "NHWC",
            "preprocessing": (
                "raw 0-255 bytes (whitening folded into weights)"
                if uint8
                else "whitened float: (x - rgb_mean) / rgb_std"
            ),
        },
        "outputs": {
            "boxes": "xyxy in input coords",
            "scores": "fused P(class)*P(object)",
            "class_ids": "argmax class",
            "keep": "validity mask after NMS + threshold",
        },
        "class_names": list(getattr(cfg_like, "class_names", ())),
        "top_k": task.top_k,
        "nms_thresh": task.nms_thresh,
        "score_thresh": task.score_thresh,
        "nms_method": task.nms_method,
        "jax_version": jax.__version__,
        "nr_devices": exported.nr_devices,
        "sharding": (
            f"batch dim sharded over a {data_parallel}-device 'data' mesh"
            if data_parallel else "single device"
        ),
    }
    with open(path_prefix + ".json", "w") as fp:
        json.dump(meta, fp, indent=1)
    return hlo_path
