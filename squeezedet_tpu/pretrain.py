"""Backbone pretraining driver: ``main.py pretrain``.

Trains the SqueezeNet classifier (models/classifier.py) on a crop dataset
built by tools/make_classification_crops.py, then exports the trunk as a
torchvision-format ``.pth`` for detection fine-tuning via ``--load_model``.
This is the in-framework replacement for step 1 of the reference's workflow
(download ImageNet squeezenet1_1 weights, reference README +
src/utils/model.py:43-61) — unobtainable here (zero egress), so the
framework produces the pretrained backbone itself.

TPU-first: the whole crop dataset is staged in HBM once (it is tiny next to
the detection sets) and an epoch is ONE dispatch — a ``lax.scan`` over
steps doing gather -> whiten -> flip-augment -> fwd/bwd -> SGD on device,
same philosophy as the detection ``--device_data`` path (parallel/epoch.py)
and equally immune to host speed and tunnel pathologies. Multi-chip: batch
axis sharded over the data mesh; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from squeezedet_tpu.models.classifier import (
    ClassifierSpec,
    export_torchvision_pth,
    forward_classifier,
    init_classifier_params,
)
from squeezedet_tpu.ops.augment import apply_erase, sample_erase_params
from squeezedet_tpu.parallel.mesh import make_mesh
from squeezedet_tpu.parallel.train import (
    TrainState,
    _ema_update,
    make_optimizer,
    schedule_lr,
)
from squeezedet_tpu.utils.checkpoint import (
    load_train_state,
    save_params,
    save_train_state,
)
from squeezedet_tpu.utils.logger import Logger


def _load_crop_data(data_dir: str):
    with open(os.path.join(data_dir, "meta.json")) as fp:
        meta = json.load(fp)
    out = {}
    for split in ("train", "val"):
        images = np.load(os.path.join(data_dir, f"images_{split}.npy"))
        labels = np.load(os.path.join(data_dir, f"labels_{split}.npy"))
        if len(images) == 0:
            raise ValueError(f"empty {split} split in {data_dir}")
        out[split] = (images, labels.astype(np.int32))
    return out, meta


def _whiten(x_u8, mean, std):
    return (x_u8.astype(jnp.float32) - mean) / std


def make_pretrain_epoch(spec: ClassifierSpec, tx, mesh, rgb_mean, rgb_std,
                        ema_decay: float = 0.0, erase_prob: float = 0.0):
    """One dispatch = one training epoch over staged crops.

    Returns ``epoch_fn(state, images_u8, labels, perm, lr, rng)`` where
    ``perm`` is (steps, batch) int32 sample indices (host-shuffled).
    ``ema_decay`` > 0 carries the EMA shadow through the epoch scan
    exactly like the detection path (parallel/train.py); ``erase_prob``
    > 0 applies random erasing (ops/augment.py, fill 0 = whitened mean)
    after the flip — its original classification setting."""
    mean = jnp.asarray(np.ravel(rgb_mean), jnp.float32)
    std = jnp.asarray(np.ravel(rgb_std), jnp.float32)
    batch_sh = NamedSharding(mesh, P("data"))

    def loss_fn(params, x, y, dropout_rng):
        logits = forward_classifier(
            params, x, spec, training=True, dropout_rng=dropout_rng
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = (jnp.argmax(logits, axis=-1) == y).mean()
        return loss, acc

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, images_u8, labels, perm, lr, rng):
        def body(state, step_in):
            idx, key = step_in
            x = _whiten(images_u8[idx], mean, std)
            y = labels[idx]
            x = lax.with_sharding_constraint(x, batch_sh)
            flip_key, drop_key = jax.random.split(jax.random.fold_in(key, 0))
            do_flip = jax.random.bernoulli(flip_key, 0.5, (x.shape[0], 1, 1, 1))
            x = jnp.where(do_flip, x[:, :, ::-1, :], x)
            if erase_prob > 0.0:
                # fold_in(1): erase-off epochs keep their exact RNG stream
                k_on, k_rect = jax.random.split(jax.random.fold_in(key, 1))
                on = jax.random.bernoulli(k_on, erase_prob, (x.shape[0],))
                rect = sample_erase_params(
                    k_rect, x.shape[0], (x.shape[1], x.shape[2])
                )
                x = apply_erase(x, rect, on, 0.0)
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, y, drop_key
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(state.params, updates)
            ema = _ema_update(state.ema, params, ema_decay, state.step)
            return (
                TrainState(params, opt_state, state.step + 1, ema),
                {"loss": loss, "acc": acc},
            )

        keys = jax.random.split(rng, perm.shape[0])
        return lax.scan(body, state, (perm, keys))

    return epoch_fn


def make_eval_fn(spec: ClassifierSpec, mesh, rgb_mean, rgb_std):
    """One dispatch = full val sweep; the last batch is wrap-padded and
    masked so every sample counts exactly once."""
    mean = jnp.asarray(np.ravel(rgb_mean), jnp.float32)
    std = jnp.asarray(np.ravel(rgb_std), jnp.float32)
    batch_sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def eval_fn(params, images_u8, labels, pos_steps, n_valid):
        n = images_u8.shape[0]

        def body(_, pos):
            # pos is the LINEAR position (un-wrapped) so the pad mask below
            # is meaningful; the gather index wraps it into range
            idx = pos % n
            x = lax.with_sharding_constraint(
                _whiten(images_u8[idx], mean, std), batch_sh
            )
            logits = forward_classifier(params, x, spec, training=False)
            ok = (jnp.argmax(logits, axis=-1) == labels[idx]).astype(jnp.float32)
            real = (pos < n_valid).astype(jnp.float32)
            # wrap-padded duplicate slots get weight 0
            return None, ((ok * real).sum(), real.sum())

        _, (correct, count) = lax.scan(body, None, pos_steps)
        return correct.sum() / jnp.maximum(count.sum(), 1.0)

    return eval_fn


def _step_indices(n: int, batch: int) -> np.ndarray:
    """Sequential (steps, batch) linear POSITIONS covering [0, n) plus the
    tail pad up to a full last batch. Positions >= n are the pad: the eval
    fn wraps them for the gather and masks them out of the accuracy."""
    steps = -(-n // batch)
    return np.arange(steps * batch).reshape(steps, batch).astype(np.int32)


def pretrain(cfg) -> None:
    data, meta = _load_crop_data(cfg.data_dir)
    classes = meta["classes"]
    rgb_mean, rgb_std = meta["rgb_mean"], meta["rgb_std"]

    mesh = make_mesh(cfg.data_parallel)
    if cfg.batch_size % mesh.size:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by mesh size {mesh.size}"
        )
    from squeezedet_tpu.models.squeezedet import ARCH_SPECS

    total_fires = sum(1 for s in ARCH_SPECS[cfg.arch]["body"] if s != "pool")
    num_fires = cfg.num_fires or (8 if cfg.arch == "squeezedet" else total_fires)
    spec = ClassifierSpec(
        arch=cfg.arch,
        num_classes=len(classes),
        num_fires=num_fires,
        dropout_prob=cfg.dropout_prob,
        compute_dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
    )
    logger = Logger(cfg)
    logger.write(
        f"pretrain: {len(data['train'][0])} train / {len(data['val'][0])} val "
        f"crops ({meta['crop_size']}px), classes {classes}, mesh {mesh.size}"
    )

    tx = make_optimizer(cfg)  # Config carries the same grad_norm /
    #   weight_decay / momentum attrs TaskSpec does
    ema_decay = float(getattr(cfg, "ema_decay", 0.0))
    params = init_classifier_params(jax.random.PRNGKey(cfg.seed), spec)
    ema = jax.tree.map(jnp.array, params) if ema_decay > 0 else None
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), ema)
    start_epoch, best = 1, -1.0
    if cfg.resume:
        state, saved_epoch, saved_best = load_train_state(cfg.resume, state)
        start_epoch = saved_epoch + 1
        best = saved_best if saved_best is not None else -1.0
        logger.write(f"resumed {cfg.resume} at epoch {saved_epoch} (best {best})")

    # stage everything in HBM once (replicated: gather indices are global)
    repl = NamedSharding(mesh, P())
    train_images = jax.device_put(data["train"][0], repl)
    train_labels = jax.device_put(data["train"][1], repl)
    val_images = jax.device_put(data["val"][0], repl)
    val_labels = jax.device_put(data["val"][1], repl)

    epoch_fn = make_pretrain_epoch(
        spec, tx, mesh, rgb_mean, rgb_std, ema_decay=ema_decay,
        erase_prob=float(getattr(cfg, "erase_prob", 0.0)),
    )
    eval_fn = make_eval_fn(spec, mesh, rgb_mean, rgb_std)
    val_idx = _step_indices(len(data["val"][0]), cfg.batch_size)

    n_train = len(data["train"][0])
    max_steps = n_train // cfg.batch_size
    if max_steps == 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} exceeds the {n_train}-crop train set"
        )
    steps = max_steps
    if cfg.num_iters > 0:
        if cfg.num_iters > max_steps:
            print(
                f"[pretrain] --num_iters {cfg.num_iters} exceeds one pass "
                f"({max_steps} steps at batch {cfg.batch_size}); clamping"
            )
        steps = min(cfg.num_iters, max_steps)
    rng = np.random.default_rng(cfg.seed)
    root = jax.random.PRNGKey(cfg.seed + 1)

    def export(params, name: str) -> None:
        path = os.path.join(cfg.save_dir, name)
        export_torchvision_pth(jax.device_get(params), spec, path)
        logger.write(f"exported torchvision-format backbone: {path}")

    for epoch in range(start_epoch, cfg.num_epochs + 1):
        t0 = time.time()
        perm = (
            rng.permutation(n_train)[: steps * cfg.batch_size]
            .reshape(steps, cfg.batch_size)
            .astype(np.int32)
        )
        lr = schedule_lr(cfg, epoch)
        state, stats = epoch_fn(
            state, train_images, train_labels, perm,
            jnp.float32(lr), jax.random.fold_in(root, epoch),
        )
        loss = float(np.asarray(stats["loss"]).mean())
        acc = float(np.asarray(stats["acc"]).mean())
        logger.update(
            {"loss": loss, "acc": acc, "lr": lr,
             "epoch_time": (time.time() - t0) / 60.0},
            "train", epoch,
        )
        if not np.isfinite(loss):
            raise FloatingPointError(f"non-finite pretrain loss at epoch {epoch}")

        if epoch % cfg.val_intervals == 0 or epoch == cfg.num_epochs:
            # score + export the weights we'd deploy (EMA under --ema_decay)
            eval_params = state.ema if state.ema is not None else state.params
            val_acc = float(
                eval_fn(
                    eval_params, val_images, val_labels, val_idx,
                    len(data["val"][0]),
                )
            )
            logger.update({"acc": val_acc}, "val", epoch)
            if val_acc > best:
                best = val_acc
                save_params(
                    os.path.join(cfg.save_dir, "model_best"),
                    eval_params, epoch,
                )
                export(eval_params, "backbone_best.pth")
        if epoch % cfg.save_intervals == 0 or epoch == cfg.num_epochs:
            save_train_state(
                os.path.join(cfg.save_dir, "state_last"), state, epoch, best
            )

    # (state_last for the final epoch was already written by the loop)
    export(
        state.ema if state.ema is not None else state.params,
        "backbone_last.pth",
    )
    logger.plot(["loss", "acc"])
    logger.print_bests(["acc"])
    logger.write(f"pretrain done: best val acc {best:.3f}")
