"""Jitted train / val / predict steps with SPMD data parallelism.

One compiled `train_step` does forward + loss + backward + clip + SGD update
entirely on device; under a multi-device mesh the batch is sharded on axis 0
and XLA inserts the gradient all-reduce (the TPU replacement for the
reference's scatter/replicate/parallel_apply/gather DataParallel,
src/utils/data_parallel.py:93-101, and its H2D/optimizer-state plumbing,
src/engine/trainer.py:36-50,82-93).

Optimizer semantics match torch SGD + StepLR (src/train.py:32-36):
grad-clip(global_norm) -> +weight_decay*param -> momentum buffer ->
-lr * buf, with lr a *runtime* scalar (no recompile when the schedule
steps: lr = lr0 * 0.5^((epoch-1)//60)).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from squeezedet_tpu.models.head import resolve
from squeezedet_tpu.models.loss import LossWeights, detection_loss
from squeezedet_tpu.models.squeezedet import ModelSpec, forward
from squeezedet_tpu.ops.postprocess import postprocess


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    # EMA shadow of params (None = disabled). Lives inside the state pytree
    # so every step variant — single, fused-k scan, grad-accum, whole-epoch
    # device-data scan (parallel/epoch.py), TP (parallel/tensor.py) —
    # carries and updates it with no extra plumbing.
    ema: Any = None


@dataclass(frozen=True)
class TaskSpec:
    """Everything static the compiled steps close over."""

    model: ModelSpec
    input_size: tuple[int, int]
    num_anchors: int
    loss_weights: LossWeights = LossWeights()
    grad_norm: float = 5.0
    momentum: float = 0.9
    weight_decay: float = 1e-4
    top_k: int = 64
    nms_thresh: float = 0.4
    score_thresh: float = 0.3
    ema_decay: float = 0.0  # 0 disables; 0.999-0.9999 typical
    nms_method: str = "hard"  # hard | soft_linear | soft_gauss
    soft_nms_sigma: float = 0.5  # gaussian decay width for soft_gauss
    bbox_loss_kind: str = "l2"  # l2 (reference parity) | ciou|diou|giou | l2+<iou>
    bbox_iou_mix: float = 0.5  # IoU-element weight in the l2+<iou> hybrids


def make_optimizer(task: TaskSpec) -> optax.GradientTransformation:
    """lr-less transform chain; the lr scale is applied in train_step so the
    schedule is a runtime input."""
    return optax.chain(
        optax.clip_by_global_norm(task.grad_norm),
        optax.add_decayed_weights(task.weight_decay),
        optax.trace(decay=task.momentum, nesterov=False),
    )


def init_train_state(params, task: TaskSpec) -> TrainState:
    tx = make_optimizer(task)
    # distinct buffers for the EMA copy: the step donates the whole state,
    # and aliased params/ema leaves would be donated twice
    ema = jax.tree.map(jnp.array, params) if task.ema_decay > 0 else None
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), ema)


def _ema_update(ema, params, decay: float, step):
    """One EMA step: ema <- d*ema + (1-d)*params, with the effective decay
    ramped as d_t = decay * (1 - exp(-(t+1)/2000)) so early steps track the
    live params closely instead of the random init the EMA was seeded with
    (the standard detection-training ramp; no reference counterpart — the
    reference has no weight averaging at all). ``step`` is the pre-update
    step counter (a traced scalar), so the ramp costs nothing and never
    recompiles."""
    if ema is None:
        return None
    d = decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / 2000.0))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)


def stepLR(base_lr: float, epoch: int, step_size: int = 60, gamma: float = 0.5) -> float:
    """torch StepLR(60, 0.5) schedule evaluated at a 1-indexed epoch."""
    return base_lr * (gamma ** ((epoch - 1) // step_size))


def schedule_lr(cfg, epoch: int) -> float:
    """Epoch learning rate from the config (epoch is 1-indexed).

    The lr is a runtime input to the jitted steps, so schedules are pure
    host functions — no recompiles, no optimizer-state coupling. Default is
    the reference's StepLR(60, 0.5) (src/train.py:36-38); --lr_schedule
    cosine and --warmup_epochs have no reference counterpart (standard
    detection recipes; useful for from-scratch --init_scheme he runs where
    the first epochs are the unstable ones).

    - warmup: linear ramp hitting the base lr AT epoch == warmup_epochs.
    - step: gamma**((e-1)//step_size) counted from the first post-warmup
      epoch, so warmup_epochs=0 is bit-identical to the reference schedule.
    - cosine: half-cosine from the base lr (first post-warmup epoch) to
      min_lr (final epoch).
    """
    base = cfg.lr
    warm = int(getattr(cfg, "warmup_epochs", 0))
    if warm > 0 and epoch <= warm:
        return base * epoch / warm
    kind = getattr(cfg, "lr_schedule", "step")
    e = epoch - warm  # 1-indexed within the post-warmup phase
    if kind == "step":
        return stepLR(
            base, e,
            int(getattr(cfg, "lr_step_size", 60)),
            float(getattr(cfg, "lr_gamma", 0.5)),
        )
    if kind == "cosine":
        min_lr = float(getattr(cfg, "min_lr", 0.0))
        total = max(int(cfg.num_epochs) - warm, 1)
        t = (e - 1) / max(total - 1, 1)  # 0 at first post-warmup, 1 at last
        return min_lr + (base - min_lr) * 0.5 * (1.0 + math.cos(math.pi * t))
    if kind == "constant":
        return base
    raise ValueError(f"unknown --lr_schedule {kind!r} (step | cosine | constant)")


def _whiten_on_device(images, rgb_stats):
    """uint8 fast-pipeline batches are whitened here (fused by XLA into the
    first conv's input read); float batches arrive pre-whitened."""
    if images.dtype == jnp.uint8:
        if rgb_stats is None:
            raise ValueError("uint8 batches require rgb_stats (fast_pipeline)")
        return (images.astype(jnp.float32) - rgb_stats[0]) / rgb_stats[1]
    return images


def _loss_for_batch(
    params, images, gt, anchors, task, dropout_rng, training, rgb_stats=None,
    sample_weights=None,
):
    """Batch loss. ``sample_weights`` (B,) — when given, the batch mean
    becomes a weighted mean (padded val slots get weight 0 so wrap-around
    padding cannot double-count head samples in the reported val loss)."""
    images = _whiten_on_device(images, rgb_stats)
    pred = forward(
        params, images, task.model, training=training, dropout_rng=dropout_rng
    )
    resolved = resolve(
        pred, anchors, task.input_size, task.model.num_classes, with_log_probs=True
    )
    loss, stats = detection_loss(
        resolved, gt, task.num_anchors, task.loss_weights,
        bbox_loss_kind=task.bbox_loss_kind, anchors_xywh=anchors,
        iou_mix=task.bbox_iou_mix,
    )
    if sample_weights is None:
        return loss.mean(), {k: v.mean() for k, v in stats.items()}
    w = sample_weights.astype(loss.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    return (
        (loss * w).sum() / denom,
        {k: (v * w).sum() / denom for k, v in stats.items()},
    )


def _sgd_step(state: TrainState, images, gt, anchors, lr, rng, task, tx, rgb_stats):
    """One optimizer step: fwd + loss + bwd + clip + SGD update."""
    dropout_rng = jax.random.fold_in(rng, state.step)

    (loss, stats), grads = jax.value_and_grad(
        lambda p: _loss_for_batch(
            p, images, gt, anchors, task, dropout_rng, True, rgb_stats
        ),
        has_aux=True,
    )(state.params)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    ema = _ema_update(state.ema, params, task.ema_decay, state.step)
    return TrainState(params, opt_state, state.step + 1, ema), stats


def make_train_step(task: TaskSpec):
    tx = make_optimizer(task)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, gt, anchors, lr, rng, rgb_stats=None):
        return _sgd_step(state, images, gt, anchors, lr, rng, task, tx, rgb_stats)

    return train_step


def make_train_step_multi(task: TaskSpec):
    """k sequential optimizer steps in ONE dispatch (`lax.scan` over k
    pre-staged batches). Numerically identical to k single dispatches —
    the per-step dropout key still folds in state.step — but the host
    round-trip cost (≈28 ms through the axon tunnel) is paid once per k
    steps instead of per step. The k batches arrive as separate sharded
    arrays and are stacked on device.

    Returns (state, stats) with each stats value shaped (k,)."""
    tx = make_optimizer(task)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_multi(state: TrainState, images_list, gt_list, anchors, lr,
                         rng, rgb_stats=None):
        images_k = jnp.stack(images_list)
        gt_k = jnp.stack(gt_list)

        def body(state, xs):
            images, gt = xs
            return _sgd_step(
                state, images, gt, anchors, lr, rng, task, tx, rgb_stats
            )

        return lax.scan(body, state, (images_k, gt_k))

    return train_step_multi


def make_train_step_accum(task: TaskSpec, n_accum: int):
    """One optimizer step from ``n_accum`` sequential microbatch backwards
    (gradient accumulation): the (B, ...) batch splits into n_accum
    microbatches of B/n_accum, a `lax.scan` accumulates their mean grads
    (so peak activation memory is one microbatch's), then clip/decay/
    momentum/update run ONCE on the mean — the standard way to train an
    effective batch that does not fit in HBM. For equal-size microbatches
    the mean of microbatch mean-grads equals the full-batch gradient, so
    this matches make_train_step up to fp reassociation (parity-tested);
    with dropout the per-microbatch masks differ from one full-batch mask,
    which only reinterprets the regulariser. Composes with any mesh — the
    microbatch axis is scanned, the batch axis stays sharded."""
    assert n_accum >= 1
    tx = make_optimizer(task)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, gt, anchors, lr, rng, rgb_stats=None):
        b = images.shape[0]
        if b % n_accum:
            raise ValueError(f"batch {b} not divisible by grad_accum {n_accum}")
        mb = b // n_accum
        images_k = images.reshape(n_accum, mb, *images.shape[1:])
        gt_k = gt.reshape(n_accum, mb, *gt.shape[1:])
        dropout_rng = jax.random.fold_in(rng, state.step)

        def micro(carry, xs):
            grads_acc, stats_acc, i = carry
            images_i, gt_i = xs
            (_, stats), grads = jax.value_and_grad(
                lambda p: _loss_for_batch(
                    p, images_i, gt_i, anchors, task,
                    jax.random.fold_in(dropout_rng, i), True, rgb_stats,
                ),
                has_aux=True,
            )(state.params)
            return (
                jax.tree.map(jnp.add, grads_acc, grads),
                jax.tree.map(jnp.add, stats_acc, stats),
                i + 1,
            ), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        zero_stats = {
            k: jnp.zeros(()) for k in ("loss", "class_loss", "score_loss", "bbox_loss")
        }
        (grads, stats, _), _ = lax.scan(
            micro,
            (zero_grads, zero_stats, jnp.zeros((), jnp.int32)),
            (images_k, gt_k),
        )
        scale = 1.0 / n_accum
        grads = jax.tree.map(lambda g: g * scale, grads)
        stats = {k: v * scale for k, v in stats.items()}

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        ema = _ema_update(state.ema, params, task.ema_decay, state.step)
        return TrainState(params, opt_state, state.step + 1, ema), stats

    return train_step


def make_val_step(task: TaskSpec):
    @jax.jit
    def val_step(params, images, gt, anchors, rgb_stats=None):
        _, stats = _loss_for_batch(
            params, images, gt, anchors, task, None, False, rgb_stats
        )
        return stats

    return val_step


def _predict_batch(params, images, anchors, task: TaskSpec):
    pred = forward(params, images, task.model, training=False)
    return postprocess(
        pred,
        anchors,
        input_size=task.input_size,
        num_classes=task.model.num_classes,
        top_k=task.top_k,
        nms_thresh=task.nms_thresh,
        score_thresh=task.score_thresh,
        nms_method=task.nms_method,
        soft_nms_sigma=task.soft_nms_sigma,
    )


def make_predict_step(task: TaskSpec):
    """Forward + full on-device post-processing: returns fixed-shape
    detections {boxes, scores, class_ids, keep}."""

    @jax.jit
    def predict_step(params, images, anchors):
        return _predict_batch(params, images, anchors, task)

    return predict_step


def _predict_batch_tta(params, images, anchors, task: TaskSpec):
    """Flip-TTA batch: the batch and its horizontal mirror both run the
    forward pass; the mirrored pass's boxes are flipped back and the two
    candidate sets merge through the standard top-K/NMS/threshold filter
    (ops/postprocess.py:postprocess_tta_flip). Same output contract as
    _predict_batch; ~2x forward FLOPs."""
    from squeezedet_tpu.ops.postprocess import postprocess_tta_flip

    pred = forward(params, images, task.model, training=False)
    pred_flip = forward(
        params, images[:, :, ::-1, :], task.model, training=False
    )
    return postprocess_tta_flip(
        pred,
        pred_flip,
        anchors,
        input_size=task.input_size,
        num_classes=task.model.num_classes,
        top_k=task.top_k,
        nms_thresh=task.nms_thresh,
        score_thresh=task.score_thresh,
        nms_method=task.nms_method,
        soft_nms_sigma=task.soft_nms_sigma,
    )


def make_predict_step_tta(task: TaskSpec):
    """Jitted flip-TTA predict step (see _predict_batch_tta)."""

    @jax.jit
    def predict_step_tta(params, images, anchors):
        return _predict_batch_tta(params, images, anchors, task)

    return predict_step_tta


def make_predict_step_multi(task: TaskSpec):
    """k batches through forward + postprocess in ONE dispatch (lax.scan);
    amortizes the tunnel round-trip for serving throughput. Returns the
    detection dict with every value stacked to (k, B, ...)."""

    @jax.jit
    def predict_step_multi(params, images_list, anchors):
        images_k = jnp.stack(images_list)

        def body(carry, images):
            return carry, _predict_batch(params, images, anchors, task)

        _, outs = lax.scan(body, None, images_k)
        return outs

    return predict_step_multi
