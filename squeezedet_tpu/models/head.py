"""Prediction resolver: split raw ConvDet output and decode it.

Per-anchor layout of the raw head output (B, A, C+5):
``[C class logits | 1 objectness logit | 4 box deltas]``
(reference src/model/squeezedet.py:100-120).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from squeezedet_tpu.ops.box_ops import deltas_to_boxes, safe_softmax


class Resolved(NamedTuple):
    class_probs: jnp.ndarray  # (B, A, C) softmax over classes
    log_class_probs: jnp.ndarray | None  # (B, A, C) log-softmax (train only)
    scores: jnp.ndarray  # (B, A, 1) sigmoid objectness
    deltas: jnp.ndarray  # (B, A, 4) raw deltas
    boxes: jnp.ndarray  # (B, A, 4) decoded xyxy, clamped to input


def resolve(
    pred: jnp.ndarray,
    anchors: jnp.ndarray,
    input_size: tuple[int, int],
    num_classes: int,
    *,
    with_log_probs: bool = False,
) -> Resolved:
    class_logits = pred[..., :num_classes]
    class_probs = safe_softmax(class_logits, axis=-1)
    log_class_probs = (
        jax.nn.log_softmax(class_logits, axis=-1) if with_log_probs else None
    )
    scores = jax.nn.sigmoid(pred[..., num_classes : num_classes + 1])
    deltas = pred[..., num_classes + 1 :]
    boxes = deltas_to_boxes(deltas, anchors, input_size)
    return Resolved(class_probs, log_class_probs, scores, deltas, boxes)


def fuse_detections(resolved: Resolved) -> dict[str, jnp.ndarray]:
    """Fuse P(class)*P(object) and reduce to per-anchor best class.

    Parity: reference src/model/squeezedet.py:197-206.
    """
    fused = resolved.class_probs * resolved.scores
    return {
        "class_ids": jnp.argmax(fused, axis=2),
        "scores": jnp.max(fused, axis=2),
        "boxes": resolved.boxes,
    }
