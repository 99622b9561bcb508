"""EMA weight averaging (--ema_decay): math, trajectory-invariance,
fused-dispatch equivalence, checkpoint round-trip.

The reference has no weight averaging at all; this is additive surface.
The EMA lives inside the TrainState pytree (parallel/train.py), so the
same tests that pin the step variants (single / fused-k / grad-accum)
pin the EMA's propagation through them.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations
from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    init_train_state,
    make_train_step,
    make_train_step_multi,
)

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
INPUT_SIZE = (96, 160)
ANCHORS = generate_anchors((6, 10), INPUT_SIZE, SEEDS)


def _task(ema_decay=0.0):
    model = ModelSpec(num_classes=3, anchors_per_grid=3, dropout_prob=0.0)
    return TaskSpec(
        model=model,
        input_size=INPUT_SIZE,
        num_anchors=ANCHORS.shape[0],
        ema_decay=ema_decay,
    )


def _batch(batch_size, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(batch_size, *INPUT_SIZE, 3)).astype(np.float32)
    gts = []
    for _ in range(batch_size):
        idx = rng.choice(ANCHORS.shape[0], 2, replace=False)
        boxes = xywh_to_xyxy(ANCHORS[idx])
        cls = rng.integers(0, 3, 2)
        gts.append(encode_annotations(cls, boxes, ANCHORS, 3))
    return images, np.stack(gts)


def _ramped_decay(decay, step):
    return decay * (1.0 - np.exp(-(step + 1.0) / 2000.0))


def test_ema_matches_host_reference():
    """state.ema after k steps == the host-computed ramped EMA of the
    per-step param trajectory."""
    decay = 0.9
    task = _task(ema_decay=decay)
    params = init_params(jax.random.PRNGKey(0), task.model)
    state = init_train_state(params, task)
    assert state.ema is not None
    step = make_train_step(task)
    images, gt = _batch(2)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(1)

    host_ema = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
    for t in range(4):
        state, _ = step(
            state, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
        )
        d = _ramped_decay(decay, t)
        host_ema = jax.tree.map(
            lambda e, p: e * d + np.asarray(p, np.float64) * (1.0 - d),
            host_ema,
            jax.device_get(state.params),
        )

    jax.tree.map(
        lambda e, h: np.testing.assert_allclose(
            np.asarray(e), h, rtol=1e-5, atol=1e-6
        ),
        jax.device_get(state.ema),
        host_ema,
    )


def test_ema_does_not_change_training_trajectory():
    """The EMA is an observer: params after k steps are bit-comparable with
    and without --ema_decay."""
    images, gt = _batch(2, seed=3)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(1)

    results = []
    for decay in (0.0, 0.999):
        task = _task(ema_decay=decay)
        params = init_params(jax.random.PRNGKey(0), task.model)
        state = init_train_state(params, task)
        step = make_train_step(task)
        for _ in range(3):
            state, _ = step(
                state, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
            )
        results.append(jax.device_get(state.params))

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        results[0],
        results[1],
    )


def test_ema_fused_multi_matches_single_steps():
    """The fused-k scan carries the EMA identically to k single dispatches."""
    task = _task(ema_decay=0.95)
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(1)
    batches = [_batch(2, seed=s) for s in range(3)]

    step = make_train_step(task)
    state_a = init_train_state(jax.tree.map(jnp.copy, params), task)
    for images, gt in batches:
        state_a, _ = step(
            state_a, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
        )

    multi = make_train_step_multi(task)
    state_b = init_train_state(jax.tree.map(jnp.copy, params), task)
    state_b, _ = multi(
        state_b,
        tuple(jnp.asarray(b[0]) for b in batches),
        tuple(jnp.asarray(b[1]) for b in batches),
        anchors, 0.01, rng,
    )

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        jax.device_get(state_a.ema),
        jax.device_get(state_b.ema),
    )


def test_ema_grad_accum_updates_ema():
    from squeezedet_tpu.parallel.train import make_train_step_accum

    task = _task(ema_decay=0.5)
    params = init_params(jax.random.PRNGKey(0), task.model)
    state = init_train_state(params, task)
    images, gt = _batch(4, seed=5)
    step = make_train_step_accum(task, 2)
    state, _ = step(
        state, jnp.asarray(images), jnp.asarray(gt), jnp.asarray(ANCHORS),
        0.01, jax.random.PRNGKey(2),
    )
    assert state.ema is not None
    # with d_0 = 0.5*(1-exp(-1/2000)) ~= 0, the EMA ~= the new params
    a = jax.tree.leaves(jax.device_get(state.ema))
    b = jax.tree.leaves(jax.device_get(state.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3)


def test_checkpoint_roundtrip_with_ema(tmp_path):
    """state_last saves/restores the EMA; pre-ema checkpoints restore into
    an EMA-enabled template by seeding from params; resuming with EMA off
    drops a saved EMA."""
    from squeezedet_tpu.utils.checkpoint import (
        load_train_state,
        save_train_state,
    )

    task = _task(ema_decay=0.9)
    # host copy: the train step donates its input state, which would
    # delete the init params' buffers out from under the later templates
    params = jax.tree.map(
        np.asarray, init_params(jax.random.PRNGKey(0), task.model)
    )
    state = init_train_state(jax.tree.map(jnp.asarray, params), task)
    step = make_train_step(task)
    images, gt = _batch(2)
    state, _ = step(
        state, jnp.asarray(images), jnp.asarray(gt), jnp.asarray(ANCHORS),
        0.01, jax.random.PRNGKey(1),
    )

    path = os.path.join(tmp_path, "state_ema")
    save_train_state(path, state, epoch=1, best=0.5)

    template = init_train_state(
        init_params(jax.random.PRNGKey(7), task.model), task
    )
    restored, epoch, best = load_train_state(path, template)
    assert epoch == 1 and best == 0.5
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.ema),
        restored.ema,
    )

    # pre-ema checkpoint -> EMA template: seeded from params
    task0 = _task(ema_decay=0.0)
    state0 = init_train_state(jax.tree.map(jnp.asarray, params), task0)
    path0 = os.path.join(tmp_path, "state_plain")
    save_train_state(path0, state0, epoch=3, best=0.1)
    restored0, epoch0, _ = load_train_state(path0, template)
    assert epoch0 == 3 and restored0.ema is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored0.ema,
        restored0.params,
    )

    # EMA checkpoint -> plain template: EMA dropped
    template0 = init_train_state(
        init_params(jax.random.PRNGKey(7), task0.model), task0
    )
    restored1, _, _ = load_train_state(path, template0)
    assert restored1.ema is None


def test_trainer_eval_params_switches_on_ema():
    """Trainer.eval_params returns the EMA shadow iff --ema_decay is on."""
    from squeezedet_tpu.config import Config
    from squeezedet_tpu.engine.trainer import Trainer
    from squeezedet_tpu.train import build_task

    cfg = Config()
    cfg.arch = "squeezedet"
    cfg.num_classes = 3
    cfg.anchors_per_grid = 3
    cfg.input_size = INPUT_SIZE
    cfg.num_anchors = ANCHORS.shape[0]
    cfg.anchors = ANCHORS
    cfg.batch_size = 8
    cfg.ema_decay = 0.999
    task = build_task(cfg)
    params = init_params(jax.random.PRNGKey(0), task.model)
    trainer = Trainer(params, task, cfg)
    assert trainer.state.ema is not None
    assert trainer.eval_params is trainer.state.ema

    cfg.ema_decay = 0.0
    task0 = build_task(cfg)
    trainer0 = Trainer(params, task0, cfg)
    assert trainer0.state.ema is None
    assert trainer0.eval_params is trainer0.state.params
