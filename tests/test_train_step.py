import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.boxes import xywh_to_xyxy
from squeezedet_tpu.core.matching import encode_annotations
from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
from squeezedet_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch_arrays,
)
from squeezedet_tpu.parallel.train import (
    TaskSpec,
    init_train_state,
    make_train_step,
    make_train_step_multi,
    make_val_step,
    schedule_lr,
    stepLR,
)

SEEDS = np.array([[34, 30], [75, 45], [38, 90]], dtype=np.float32)
INPUT_SIZE = (96, 160)
ANCHORS = generate_anchors((6, 10), INPUT_SIZE, SEEDS)


def _task(dropout=0.0):
    model = ModelSpec(num_classes=3, anchors_per_grid=3, dropout_prob=dropout)
    return TaskSpec(model=model, input_size=INPUT_SIZE, num_anchors=ANCHORS.shape[0])


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


def test_steplr_schedule():
    assert stepLR(0.01, 1) == 0.01
    assert stepLR(0.01, 60) == 0.01
    assert stepLR(0.01, 61) == 0.005
    assert stepLR(0.01, 121) == 0.0025


class _SchedCfg:
    lr = 0.01
    lr_schedule = "step"
    lr_step_size = 60
    lr_gamma = 0.5
    warmup_epochs = 0
    min_lr = 0.0
    num_epochs = 300


def test_schedule_lr_step_matches_reference_steplr():
    cfg = _SchedCfg()
    for e in (1, 59, 60, 61, 120, 121, 300):
        assert schedule_lr(cfg, e) == stepLR(cfg.lr, e)


def test_schedule_lr_warmup_ramps_then_hands_off():
    cfg = _SchedCfg()
    cfg.warmup_epochs = 5
    ramp = [schedule_lr(cfg, e) for e in range(1, 6)]
    assert ramp == sorted(ramp) and ramp[-1] == cfg.lr
    assert ramp[0] == pytest.approx(cfg.lr / 5)
    # post-warmup step schedule counts from the first post-warmup epoch:
    # decay boundary shifts by warmup_epochs
    assert schedule_lr(cfg, 65) == cfg.lr
    assert schedule_lr(cfg, 66) == cfg.lr * 0.5


def test_schedule_lr_cosine_endpoints_and_monotone():
    cfg = _SchedCfg()
    cfg.lr_schedule = "cosine"
    cfg.min_lr = 1e-4
    vals = [schedule_lr(cfg, e) for e in range(1, cfg.num_epochs + 1)]
    assert vals[0] == pytest.approx(cfg.lr)
    assert vals[-1] == pytest.approx(cfg.min_lr)
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    mid = vals[len(vals) // 2]
    assert cfg.min_lr < mid < cfg.lr


def test_schedule_lr_rejects_unknown():
    cfg = _SchedCfg()
    cfg.lr_schedule = "linear"
    with pytest.raises(ValueError):
        schedule_lr(cfg, 1)


def test_train_step_runs_and_descends():
    task = _task()
    params = init_params(jax.random.PRNGKey(0), task.model)
    state = init_train_state(params, task)
    step = make_train_step(task)
    images, gt = _batch(4)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(4):
        state, stats = step(state, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4


def test_multi_step_dispatch_matches_single_steps():
    """k fused steps (one lax.scan dispatch) must be numerically identical
    to k single-step dispatches — same dropout keys, same SGD math."""
    task = _task(dropout=0.5)
    params = init_params(jax.random.PRNGKey(0), task.model)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(1)
    batches = [_batch(2, seed=s) for s in range(4)]

    step = make_train_step(task)
    state_a = init_train_state(jax.tree.map(jnp.copy, params), task)
    losses_a = []
    for images, gt in batches:
        state_a, stats = step(
            state_a, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
        )
        losses_a.append(float(stats["loss"]))

    multi = make_train_step_multi(task)
    state_b = init_train_state(jax.tree.map(jnp.copy, params), task)
    imgs = tuple(jnp.asarray(b[0]) for b in batches)
    gts = tuple(jnp.asarray(b[1]) for b in batches)
    state_b, stats_k = multi(state_b, imgs, gts, anchors, 0.01, rng)

    np.testing.assert_allclose(
        np.asarray(stats_k["loss"]), np.asarray(losses_a), rtol=1e-5
    )
    assert int(state_b.step) == int(state_a.step) == 4
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_multi_step_dispatch_sharded_runs():
    """The fused-k dispatch must compile and run under the 8-device mesh."""
    assert len(jax.devices()) >= 8
    task = _task()
    mesh = make_mesh(8)
    state = replicate(mesh, init_train_state(init_params(jax.random.PRNGKey(0), task.model), task))
    anchors = replicate(mesh, jnp.asarray(ANCHORS))
    multi = make_train_step_multi(task)
    sharded = [
        shard_batch_arrays(mesh, dict(zip(("image", "gt"), _batch(8, seed=s))))
        for s in range(2)
    ]
    state, stats_k = multi(
        state,
        tuple(b["image"] for b in sharded),
        tuple(b["gt"] for b in sharded),
        anchors, 0.01, jax.random.PRNGKey(1),
    )
    assert np.all(np.isfinite(np.asarray(stats_k["loss"])))
    assert int(state.step) == 2


def test_val_step_no_dropout_deterministic():
    task = _task(dropout=0.5)
    params = init_params(jax.random.PRNGKey(0), task.model)
    val = make_val_step(task)
    images, gt = _batch(2)
    s1 = val(params, jnp.asarray(images), jnp.asarray(gt), jnp.asarray(ANCHORS))
    s2 = val(params, jnp.asarray(images), jnp.asarray(gt), jnp.asarray(ANCHORS))
    assert float(s1["loss"]) == float(s2["loss"])


def test_sgd_matches_torch_semantics():
    """clip -> weight decay -> momentum -> -lr*buf on a toy quadratic."""
    import torch

    task = _task()
    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)

    # torch side
    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=1e-4)
    for _ in range(3):
        opt.zero_grad()
        loss = (wt ** 2).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([wt], task.grad_norm)
        opt.step()

    # our side: same chain via the train-step math
    import optax

    from squeezedet_tpu.parallel.train import make_optimizer

    tx = make_optimizer(task)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        grads = jax.grad(lambda p: (p["w"] ** 2).sum())(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -0.1 * u, updates)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_data_parallel_matches_single_device():
    """The sharded 8-device step must produce the same update as one device
    (XLA all-reduces the grads; math is identical)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    task = _task()
    params = init_params(jax.random.PRNGKey(0), task.model)
    images, gt = _batch(8)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(1)

    # single device (fresh param copies: train_step donates its input state)
    step1 = make_train_step(task)
    state1 = init_train_state(jax.tree.map(jnp.copy, params), task)
    state1, stats1 = step1(state1, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng)

    # 8-device mesh
    mesh = make_mesh(8)
    step8 = make_train_step(task)
    state8 = init_train_state(jax.tree.map(jnp.copy, params), task)
    state8 = replicate(mesh, state8)
    batch = shard_batch_arrays(mesh, {"image": images, "gt": gt})
    anchors8 = replicate(mesh, anchors)
    state8, stats8 = step8(state8, batch["image"], batch["gt"], anchors8, 0.01, rng)

    np.testing.assert_allclose(
        float(stats8["loss"]), float(stats1["loss"]), rtol=1e-5
    )
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_remat_grads_match_no_remat():
    """--remat (jax.checkpoint per fire) must be numerically invisible:
    same loss, same gradients — only the backward's memory/FLOPs schedule
    changes."""
    from dataclasses import replace

    from squeezedet_tpu.parallel.train import _loss_for_batch

    task = _task()
    task_r = TaskSpec(
        model=replace(task.model, remat=True),
        input_size=task.input_size,
        num_anchors=task.num_anchors,
    )
    params = init_params(jax.random.PRNGKey(0), task.model)
    images, gt = _batch(2, seed=3)
    anchors = jnp.asarray(ANCHORS)

    def loss_grads(t):
        return jax.jit(
            jax.value_and_grad(
                lambda p: _loss_for_batch(
                    p, jnp.asarray(images), jnp.asarray(gt), anchors, t,
                    None, False,
                )[0]
            )
        )(params)

    loss_a, grads_a = loss_grads(task)
    loss_b, grads_b = loss_grads(task_r)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        grads_a,
        grads_b,
    )


def test_grad_accum_matches_full_batch_step():
    """make_train_step_accum(n) on a (B,) batch == make_train_step on the
    same batch (mean of equal-size microbatch mean-grads is the full-batch
    gradient), across 2 optimizer steps with momentum."""
    from squeezedet_tpu.parallel.train import make_train_step_accum

    task = _task()
    params_np = jax.tree.map(
        np.asarray, init_params(jax.random.PRNGKey(0), task.model)
    )
    images, gt = _batch(4, seed=4)
    anchors = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(5)

    def fresh():
        return init_train_state(jax.tree.map(jnp.asarray, params_np), task)

    step_full = make_train_step(task)
    step_accum = make_train_step_accum(task, 2)
    state_f, state_a = fresh(), fresh()
    for _ in range(2):
        state_f, stats_f = step_full(
            state_f, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
        )
        state_a, stats_a = step_accum(
            state_a, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
        )

    np.testing.assert_allclose(
        float(stats_a["loss"]), float(stats_f["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        ),
        state_a.params,
        state_f.params,
    )


def test_grad_accum_sharded_matches_single_device():
    """The accumulation scan composes with the data-parallel mesh: an
    8-device sharded accum step equals the single-device accum step."""
    from squeezedet_tpu.parallel.train import make_train_step_accum

    assert len(jax.devices()) >= 8
    task = _task()
    params_np = jax.tree.map(
        np.asarray, init_params(jax.random.PRNGKey(0), task.model)
    )
    images, gt = _batch(16, seed=6)
    anchors_r = jnp.asarray(ANCHORS)
    rng = jax.random.PRNGKey(7)

    def fresh():
        return init_train_state(jax.tree.map(jnp.asarray, params_np), task)

    step = make_train_step_accum(task, 2)
    state_1, stats_1 = step(
        fresh(), jnp.asarray(images), jnp.asarray(gt), anchors_r, 0.01, rng
    )

    mesh = make_mesh(8)
    sharded = shard_batch_arrays(mesh, {"image": images, "gt": gt})
    state_n, stats_n = step(
        replicate(mesh, fresh()),
        sharded["image"],
        sharded["gt"],
        replicate(mesh, anchors_r),
        0.01,
        replicate(mesh, rng),
    )
    np.testing.assert_allclose(
        float(stats_n["loss"]), float(stats_1["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(state_n.params), jax.tree.leaves(state_1.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_training_is_bitwise_deterministic():
    """Two training runs from the same seeds must produce bit-identical
    params — the reproducibility contract production debugging relies on
    (reference only seeds, never verifies: src/utils/misc.py:9-16).
    Dropout is ON so the rng plumbing is part of the contract."""
    task = _task(dropout=0.5)
    anchors = jnp.asarray(ANCHORS)
    batches = [_batch(2, seed=s) for s in range(3)]

    def run():
        params = init_params(jax.random.PRNGKey(0), task.model)
        state = init_train_state(params, task)
        step = make_train_step(task)
        rng = jax.random.PRNGKey(1)
        for images, gt in batches:
            state, _ = step(
                state, jnp.asarray(images), jnp.asarray(gt), anchors, 0.01, rng
            )
        return state

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
