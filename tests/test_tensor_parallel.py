"""Tensor (channel) parallelism parity on the virtual 8-device CPU mesh:
the Megatron-style column/row sharding plan (parallel/tensor.py) must be
numerically invisible — TP predict and TP train steps equal their
single-device twins — while actually splitting the weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations
from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
from squeezedet_tpu.parallel.tensor import (
    MODEL_AXIS,
    make_tp_mesh,
    make_tp_predict_step,
    make_tp_train_step,
    shard_params_tp,
    shard_train_state_tp,
    tp_batch_sharding,
)
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    init_train_state,
    make_predict_step,
    make_train_step,
)

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
INPUT_SIZE = (96, 160)
ANCHORS = generate_anchors((6, 10), INPUT_SIZE, SEEDS)


def _task(arch="squeezedet"):
    return TaskSpec(
        model=ModelSpec(arch=arch, num_classes=3, anchors_per_grid=3,
                        dropout_prob=0.0),
        input_size=INPUT_SIZE,
        num_anchors=ANCHORS.shape[0],
    )


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(n, *INPUT_SIZE, 3)).astype(np.float32)
    gts = []
    for _ in range(n):
        idx = rng.choice(ANCHORS.shape[0], 2, replace=False)
        gts.append(
            encode_annotations(
                rng.integers(0, 3, 2), xywh_to_xyxy(ANCHORS[idx]), ANCHORS, 3
            )
        )
    return images, np.stack(gts)


@pytest.mark.parametrize("arch", ["squeezedet", "squeezedetplus"])
def test_tp_predict_matches_single_device(arch):
    assert len(jax.devices()) >= 8
    task = _task(arch)
    params_np = jax.tree.map(
        np.asarray, init_params(jax.random.PRNGKey(0), task.model)
    )
    images, _ = _batch(4)
    anchors = jnp.asarray(ANCHORS)

    out_1 = make_predict_step(task)(
        jax.tree.map(jnp.asarray, params_np), jnp.asarray(images), anchors
    )

    mesh = make_tp_mesh(1, 8)  # pure tensor parallelism
    params_tp = shard_params_tp(
        mesh, jax.tree.map(jnp.asarray, params_np), task.model.arch
    )
    # the sharding plan must actually split the channel dims
    sq_w = params_tp["fire0"]["squeeze"]["w"]
    assert sq_w.sharding.spec[3] == MODEL_AXIS
    shard_shapes = {s.data.shape for s in sq_w.addressable_shards}
    assert shard_shapes == {sq_w.shape[:3] + (sq_w.shape[3] // 8,)}

    out_tp = make_tp_predict_step(task, mesh)(
        params_tp,
        jax.device_put(images, tp_batch_sharding(mesh)),
        jax.device_put(anchors, NamedSharding(mesh, P())),
    )
    for key in ("keep", "class_ids", "scores", "boxes"):
        np.testing.assert_allclose(
            np.asarray(out_tp[key]), np.asarray(out_1[key]), rtol=1e-4, atol=1e-4
        )


def test_tp_2d_train_steps_match_single_device():
    assert len(jax.devices()) >= 8
    task = _task()
    params_np = jax.tree.map(
        np.asarray, init_params(jax.random.PRNGKey(0), task.model)
    )
    images, gt = _batch(8, seed=1)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(2)

    def fresh_state():
        return init_train_state(jax.tree.map(jnp.asarray, params_np), task)

    state_1 = fresh_state()
    step_1 = make_train_step(task)
    for _ in range(2):
        state_1, stats_1 = step_1(
            state_1, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
        )

    mesh = make_tp_mesh(2, 4)  # data x model 2-D mesh
    state_tp = shard_train_state_tp(mesh, fresh_state(), task.model.arch)
    step_tp = make_tp_train_step(task, mesh, state_tp)
    bsh = tp_batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    for _ in range(2):
        state_tp, stats_tp = step_tp(
            state_tp,
            jax.device_put(images, bsh),
            jax.device_put(gt, bsh),
            jax.device_put(anchors, rep),
            0.01,
            jax.device_put(rng, rep),
        )

    np.testing.assert_allclose(
        float(stats_tp["loss"]), float(stats_1["loss"]), rtol=1e-5
    )
    # updated params keep the plan (sharding-stable stepping) and the values
    for name, a, b in zip(
        ("squeeze.w",),
        (state_tp.params["fire2"]["squeeze"]["w"],),
        (state_1.params["fire2"]["squeeze"]["w"],),
    ):
        assert a.sharding.spec[3] == MODEL_AXIS, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    for a, b in zip(
        jax.tree.leaves(state_tp.params), jax.tree.leaves(state_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_tp_rejects_non_divisible_model_axis():
    task = _task()
    params = init_params(jax.random.PRNGKey(0), task.model)
    mesh = make_tp_mesh(1, 3)  # squeeze width 16 % 3 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_params_tp(mesh, params, task.model.arch)
