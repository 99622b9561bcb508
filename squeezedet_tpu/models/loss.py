"""Four-part SqueezeDet detection loss.

Terms (reference src/model/squeezedet.py:133-174, default weights
1 / 3.75 / 100 / 6 from src/utils/config.py:60-67):

- class CE on positive anchors, /num_objects
- positive score loss (IoU - score)^2 on positives, /num_objects
- negative score loss score^2 on negatives, /(A - num_objects)
  (IoU targets are pre-masked to zero on negatives)
- bbox L2 on deltas over positives, /num_objects

Unlike the reference, the num_objects divisions are epsilon-guarded so an
image with zero GT boxes contributes zero positive-term loss instead of NaN
(reference hazard noted at src/model/squeezedet.py:143-149).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from squeezedet_tpu.models.head import Resolved
from squeezedet_tpu.ops.box_ops import compute_overlaps

EPSILON = 1e-10


class LossWeights(NamedTuple):
    class_weight: float = 1.0
    positive_score_weight: float = 3.75
    negative_score_weight: float = 100.0
    bbox_weight: float = 6.0


def detection_loss(
    resolved: Resolved,
    gt: jnp.ndarray,
    num_anchors: int,
    weights: LossWeights = LossWeights(),
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Compute the per-sample loss vector and its component stats.

    :param resolved: resolver output with log_class_probs populated.
    :param gt: (B, A, C+9) dense GT tensor
        [mask | gt_box xyxy | gt_deltas | one-hot class].
    :return: (loss (B,), stats dict of (B,) arrays)
    """
    anchor_masks = gt[..., :1]
    gt_boxes = gt[..., 1:5]
    gt_deltas = gt[..., 5:9]
    gt_class_onehot = gt[..., 9:]

    num_objects = jnp.sum(anchor_masks, axis=[1, 2])
    pos_norm = num_objects + EPSILON
    neg_norm = num_anchors - num_objects + EPSILON

    overlaps = compute_overlaps(gt_boxes, resolved.boxes) * anchor_masks

    class_loss = (
        jnp.sum(
            weights.class_weight
            * anchor_masks
            * gt_class_onehot
            * (-resolved.log_class_probs),
            axis=[1, 2],
        )
        / pos_norm
    )

    positive_score_loss = (
        jnp.sum(
            weights.positive_score_weight
            * anchor_masks
            * (overlaps - resolved.scores) ** 2,
            axis=[1, 2],
        )
        / pos_norm
    )

    negative_score_loss = (
        jnp.sum(
            weights.negative_score_weight
            * (1.0 - anchor_masks)
            * (overlaps - resolved.scores) ** 2,
            axis=[1, 2],
        )
        / neg_norm
    )

    bbox_loss = (
        jnp.sum(
            weights.bbox_weight * anchor_masks * (resolved.deltas - gt_deltas) ** 2,
            axis=[1, 2],
        )
        / pos_norm
    )

    loss = class_loss + positive_score_loss + negative_score_loss + bbox_loss
    stats = {
        "loss": loss,
        "class_loss": class_loss,
        "score_loss": positive_score_loss + negative_score_loss,
        "bbox_loss": bbox_loss,
    }
    return loss, stats
