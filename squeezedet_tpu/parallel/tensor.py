"""Tensor (channel) parallelism: Megatron-style sharding of the fire stack.

The reference's only parallel strategy is batch-axis DataParallel
(src/utils/data_parallel.py:93-113); it has no tensor parallelism. On a TPU
slice the natural second mesh axis shards the CHANNEL dimension, and with
GSPMD it costs no hand-written collectives: annotate the weight shardings,
jit the unchanged forward/step, and the partitioner inserts the
reduce-scatter/all-reduce where partial sums meet.

Sharding plan (the classic column/row pairing, one all-reduce per fire):

- ``stem``            replicated — 3 input channels, not worth splitting.
- ``fire*.squeeze``   column-parallel: ``w`` sharded on OUT channels
                      (HWIO axis 3), ``b`` sharded. The squeeze activation
                      — the only wide-channel intermediate — lives sharded.
- ``fire*.expand{1,3}`` row-parallel: ``w`` sharded on IN channels (axis 2),
                      which already matches the sharded squeeze activation;
                      each device holds a partial sum of the full expand
                      output and XLA emits ONE all-reduce per fire at the
                      concat. ``b`` replicated.
- ``convdet``         row-parallel over its 768/512 input channels (the
                      largest single conv in the net); input slicing is
                      free, output psums once, and the (C+5)-interleaved
                      head layout never crosses devices.

Every squeeze width in both ARCH_SPECS is divisible by 8, so the plan holds
on model-axis sizes 2/4/8 with zero padding.

When to use: alone (pure TP) for latency on batch sizes too small to
data-shard, or as the second axis of a (data, model) 2-D mesh at scale.
Parity: TP predict/train match single-device outputs on the virtual mesh
(tests/test_tensor_parallel.py) and in the driver's dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from squeezedet_tpu.models.squeezedet import ARCH_SPECS, fire_param_names
from squeezedet_tpu.parallel.mesh import DATA_AXIS
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    TrainState,
    _predict_batch,
    _sgd_step,
    make_optimizer,
)

MODEL_AXIS = "model"


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh. The model axis should map to the faster
    (inner/ICI-adjacent) device ring; on a real slice pass ``devices`` in
    physical order so neighbouring model shards are ICI neighbours."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_param_specs(arch: str) -> dict:
    """Params-shaped pytree of PartitionSpec implementing the plan above."""
    col = {"w": P(None, None, None, MODEL_AXIS), "b": P(MODEL_AXIS)}
    row = {"w": P(None, None, MODEL_AXIS, None), "b": P()}
    rep = {"w": P(), "b": P()}
    specs = {"stem": rep, "convdet": row}
    for name in fire_param_names(ARCH_SPECS[arch]["body"]):
        specs[name] = {"squeeze": col, "expand1": row, "expand3": row}
    return specs


def _as_shardings(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def tp_param_shardings(mesh: Mesh, arch: str) -> dict:
    return _as_shardings(mesh, tp_param_specs(arch))


def shard_params_tp(mesh: Mesh, params, arch: str):
    """device_put the param pytree with channel shardings. Checks the plan's
    divisibility precondition loudly instead of letting GSPMD pad."""
    n_model = mesh.shape[MODEL_AXIS]
    for name in fire_param_names(ARCH_SPECS[arch]["body"]):
        sq = params[name]["squeeze"]["b"].shape[0]
        if sq % n_model:
            raise ValueError(
                f"{name}.squeeze width {sq} is not divisible by the "
                f"{n_model}-way model axis"
            )
    # convdet is row-sharded over its INPUT channels (the body's output
    # width) — check it too, or GSPMD silently pads the shard (the exact
    # behavior this function exists to prevent)
    cd_in = params["convdet"]["w"].shape[2]
    if cd_in % n_model:
        raise ValueError(
            f"convdet input width {cd_in} is not divisible by the "
            f"{n_model}-way model axis"
        )
    return jax.device_put(params, tp_param_shardings(mesh, arch))


def _state_shardings(mesh: Mesh, arch: str, opt_state, has_ema: bool = False):
    """TrainState-shaped sharding tree: momentum mirrors the param plan,
    the EMA shadow (when present) mirrors it too, everything else
    replicated. ``opt_state`` is the template whose chain structure
    (clip -> weight-decay -> trace) we walk."""
    pshard = tp_param_shardings(mesh, arch)
    rep = NamedSharding(mesh, P())

    def put(elem):
        if isinstance(elem, optax.TraceState):
            return optax.TraceState(trace=pshard)
        return jax.tree.map(lambda _: rep, elem)

    return TrainState(
        params=pshard,
        opt_state=tuple(put(s) for s in opt_state),
        step=rep,
        ema=pshard if has_ema else None,
    )


def shard_train_state_tp(mesh: Mesh, state: TrainState, arch: str) -> TrainState:
    return jax.device_put(
        state,
        _state_shardings(
            mesh, arch, state.opt_state, has_ema=state.ema is not None
        ),
    )


def tp_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches shard on the data axis only; with n_data == 1
    this is replication and the mesh runs pure tensor parallelism."""
    return NamedSharding(mesh, P(DATA_AXIS))


def make_tp_predict_step(task: TaskSpec, mesh: Mesh):
    """Predict step with channel-sharded weights. Inputs: params already
    placed by shard_params_tp, images placed by tp_batch_sharding, anchors
    replicated; the fixed-shape detections come back replicated."""
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=rep)
    def predict_step(params, images, anchors):
        return _predict_batch(params, images, anchors, task)

    return predict_step


def make_tp_train_step(task: TaskSpec, mesh: Mesh, state: TrainState):
    """Train step over the 2-D mesh: batch sharded on ``data``, weights on
    ``model``. Gradients inherit the param shardings (bwd of a row-parallel
    conv is column-parallel — no extra placement needed) and the explicit
    out_shardings pin the updated state to the same plan, so stepping is
    sharding-stable across epochs. Donates the input state like
    make_train_step. ``state`` is only the opt-state structure template."""
    tx = make_optimizer(task)
    rep = NamedSharding(mesh, P())
    out_shardings = (
        _state_shardings(
            mesh, task.model.arch, state.opt_state,
            has_ema=state.ema is not None,
        ),
        rep,
    )

    @partial(jax.jit, donate_argnums=(0,), out_shardings=out_shardings)
    def train_step(state, images, gt, anchors, lr, rng, rgb_stats=None):
        return _sgd_step(state, images, gt, anchors, lr, rng, task, tx, rgb_stats)

    return train_step


def make_tp_train_step_multi(task: TaskSpec, mesh: Mesh, state: TrainState):
    """TP twin of parallel.train.make_train_step_multi: k optimizer steps in
    ONE dispatch (lax.scan over k pre-staged batches), out_shardings pinned
    to the channel plan so the fused dispatch is sharding-stable too."""
    import jax.numpy as jnp
    from jax import lax

    tx = make_optimizer(task)
    rep = NamedSharding(mesh, P())
    out_shardings = (
        _state_shardings(
            mesh, task.model.arch, state.opt_state,
            has_ema=state.ema is not None,
        ),
        rep,
    )

    @partial(jax.jit, donate_argnums=(0,), out_shardings=out_shardings)
    def train_step_multi(state, images_list, gt_list, anchors, lr, rng,
                         rgb_stats=None):
        images_k = jnp.stack(images_list)
        gt_k = jnp.stack(gt_list)

        def body(state, xs):
            images, gt = xs
            return _sgd_step(
                state, images, gt, anchors, lr, rng, task, tx, rgb_stats
            )

        return lax.scan(body, state, (images_k, gt_k))

    return train_step_multi
