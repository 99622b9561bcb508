"""Pipeline parallelism parity (parallel/pipeline.py): the GPipe-style
stage chain must be numerically invisible — streamed predict matches the
single-device detector and recompute-backward microbatch grads match the
single-device full-batch gradient (with and without dropout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations
from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
from squeezedet_tpu.parallel.pipeline import (
    make_pipeline,
    split_params,
    split_stages,
)
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    _loss_for_batch,
    make_predict_step,
)

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
INPUT_SIZE = (96, 160)
ANCHORS = generate_anchors((6, 10), INPUT_SIZE, SEEDS)


def _task(dropout=0.0, arch="squeezedet"):
    return TaskSpec(
        model=ModelSpec(arch=arch, num_classes=3, anchors_per_grid=3,
                        dropout_prob=dropout),
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


def _merge(stage_grads):
    out = {}
    for g in stage_grads:
        out.update(g)
    return out


@pytest.mark.parametrize("arch", ["squeezedet", "squeezedetplus"])
def test_stage_split_is_contiguous_and_balanced(arch):
    task = _task(arch=arch)
    for n in (2, 3, 4, 8):
        stages = split_stages(task, n)
        assert len(stages) == n
        assert all(stages), stages  # no empty stage
        flat = [op for s in stages for op in s]
        assert flat[0] == ("stem",) and flat[-1] == ("convdet",)
        fires = [op[1] for op in flat if op[0] == "fire"]
        assert fires == sorted(fires) == list(range(10))
        # every param lands in exactly one stage
        params = init_params(jax.random.PRNGKey(0), task.model)
        staged = split_params(params, stages)
        names = [k for p in staged for k in p]
        assert sorted(names) == sorted(params)


@pytest.mark.parametrize("arch", ["squeezedet", "squeezedetplus"])
def test_pipeline_predict_matches_single_device(arch):
    assert len(jax.devices()) >= 4
    task = _task(arch=arch)
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    images, _ = _batch(4)
    mbs = [images[:2], images[2:]]

    pipe = make_pipeline(task, jax.devices()[:4])
    staged = pipe.place_params(params)
    assert len(staged) == 4
    outs = pipe.predict(staged, mbs, anchors)

    ref_step = make_predict_step(task)
    for mb, out in zip(mbs, outs):
        ref = ref_step(params, jnp.asarray(mb), anchors)
        for key in ("keep", "class_ids", "scores", "boxes"):
            np.testing.assert_allclose(
                np.asarray(out[key]), np.asarray(ref[key]), rtol=1e-4, atol=1e-4
            )


def test_pipeline_grads_match_single_device():
    assert len(jax.devices()) >= 4
    task = _task()
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    images, gt = _batch(4, seed=1)

    pipe = make_pipeline(task, jax.devices()[:4])
    staged = pipe.place_params(params)
    loss, grads = pipe.loss_and_grads(
        staged, [images[:2], images[2:]], [gt[:2], gt[2:]], anchors
    )
    merged = _merge([jax.device_get(g) for g in grads])

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _loss_for_batch(
            p, jnp.asarray(images), jnp.asarray(gt), anchors, task, None, False
        )[0]
    )(params)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    assert jax.tree.structure(merged) == jax.tree.structure(
        jax.tree.map(np.asarray, ref_grads)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        merged,
        ref_grads,
    )


def test_pipeline_x_data_predict_matches_single_device():
    """pp x dp composition: a 2-stage x 4-replica chain (8 devices) must be
    numerically invisible for inference — every stage's activations are
    batch-sharded over its group, hops reshard between groups."""
    assert len(jax.devices()) >= 8
    task = _task()
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    images, _ = _batch(8)
    mbs = [images[:4], images[4:]]

    pipe = make_pipeline(task, jax.devices()[:8], n_stages=2, dp=4)
    staged = pipe.place_params(params)
    assert len(staged) == 2
    # stage params replicated over the 4-device group
    assert len(staged[0]["stem"]["w"].sharding.device_set) == 4
    outs = pipe.predict(staged, mbs, anchors)

    ref_step = make_predict_step(task)
    for mb, out in zip(mbs, outs):
        ref = ref_step(params, jnp.asarray(mb), anchors)
        for key in ("keep", "class_ids", "scores", "boxes"):
            np.testing.assert_allclose(
                np.asarray(out[key]), np.asarray(ref[key]), rtol=1e-4,
                atol=1e-4,
            )


@pytest.mark.parametrize("n_stages,dp", [(2, 4), (4, 2)])
def test_pipeline_x_data_grads_match_single_device(n_stages, dp):
    """pp x dp training parity on both 8-device factorizations: recompute
    backward over batch-sharded stage groups (XLA all-reduces each group's
    param grads over the sharded-batch contraction) must reproduce the
    single-device full-batch gradient."""
    assert len(jax.devices()) >= 8
    task = _task()
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    images, gt = _batch(8, seed=3)

    pipe = make_pipeline(task, jax.devices()[:8], n_stages=n_stages, dp=dp)
    staged = pipe.place_params(params)
    loss, grads = pipe.loss_and_grads(
        staged, [images[:4], images[4:]], [gt[:4], gt[4:]], anchors
    )
    merged = _merge([jax.device_get(g) for g in grads])

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _loss_for_batch(
            p, jnp.asarray(images), jnp.asarray(gt), anchors, task, None,
            False,
        )[0]
    )(params)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        merged,
        jax.tree.map(np.asarray, ref_grads),
    )


def test_pipeline_dropout_grads_match_single_device():
    assert len(jax.devices()) >= 2
    task = _task(dropout=0.5)
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    images, gt = _batch(2, seed=2)
    rng = jax.random.PRNGKey(7)

    pipe = make_pipeline(task, jax.devices()[:2])
    staged = pipe.place_params(params)
    loss, grads = pipe.loss_and_grads(
        staged, [images], [gt], anchors, rng=rng
    )
    merged = _merge([jax.device_get(g) for g in grads])

    mb_rng = jax.random.fold_in(rng, 0)  # the pipeline's per-microbatch fold
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _loss_for_batch(
            p, jnp.asarray(images), jnp.asarray(gt), anchors, task, mb_rng, True
        )[0]
    )(params)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(merged["convdet"]["w"]),
        np.asarray(ref_grads["convdet"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(merged["stem"]["w"]),
        np.asarray(ref_grads["stem"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
