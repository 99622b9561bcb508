"""On-device GT -> anchor assignment and dense-GT encoding.

Device twin of :mod:`squeezedet_tpu.core.matching` (host numpy; reference
semantics at src/utils/boxes.py:84-135 and src/datasets/base.py:61-76).
Moving the encode onto the TPU lets the whole training data path live in
HBM: batches are gathered, augmented and encoded inside the jitted epoch
(see parallel/epoch.py) with zero per-step host work or H2D traffic.

The assignment is sequential greedy with a uniqueness mask, expressed as a
`lax.scan` over a fixed number of padded GT slots:

1. slot i picks the un-taken anchor with the largest IoU, if that IoU > 0;
2. otherwise the un-taken anchor with the smallest squared L2 distance in
   xywh space.

Per slot this is one masked argmax/argmin over A anchors — at most
``max_objects`` (typically 16) scan steps of O(A) work, trivially vmapped
over the batch. Parity with the host matcher is asserted in
tests/test_device_data.py (test_encode_device_*; ties between float IoUs
aside, which are order-arbitrary in the reference too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from squeezedet_tpu.ops.box_ops import xywh_to_xyxy, xyxy_to_xywh

EPSILON = 1e-10

# single source of the +1-convention corner<->center math (CLAUDE.md calls
# the convention out as correctness-critical — no second copy to drift)
_xywh_to_xyxy = xywh_to_xyxy
_xyxy_to_xywh = xyxy_to_xywh


def _iou_one_vs_all(anchors_xyxy, box):
    """Exclusive-area IoU of one xyxy box against all anchors
    (host twin: core/boxes.py compute_overlaps_one)."""
    lr = jnp.maximum(
        jnp.minimum(anchors_xyxy[:, 2], box[2])
        - jnp.maximum(anchors_xyxy[:, 0], box[0]),
        0.0,
    )
    tb = jnp.maximum(
        jnp.minimum(anchors_xyxy[:, 3], box[3])
        - jnp.maximum(anchors_xyxy[:, 1], box[1]),
        0.0,
    )
    inter = lr * tb
    union = (
        (anchors_xyxy[:, 2] - anchors_xyxy[:, 0])
        * (anchors_xyxy[:, 3] - anchors_xyxy[:, 1])
        + (box[2] - box[0]) * (box[3] - box[1])
        - inter
    )
    return inter / (union + EPSILON)


def match_anchors_device(boxes_xyxy, valid, anchors_xywh, anchors_xyxy):
    """Greedy-unique anchor assignment for padded GT slots.

    :param boxes_xyxy: (M, 4) padded GT boxes.
    :param valid: (M,) bool, True for real slots.
    :param anchors_xywh: (A, 4); ``anchors_xyxy``: (A, 4) same anchors.
    :return: (chosen (M,) int32 — A for invalid slots, deltas (M, 4),
        iou_all (M, A) — the assignment geometry, reused by the
        multi-positive extras pass instead of recomputing it).
    """
    num_anchors = anchors_xywh.shape[0]
    boxes_xywh = _xyxy_to_xywh(boxes_xyxy)

    # hoist the O(M*A) geometry out of the sequential part: IoU and
    # fallback-distance matrices for every slot at once (one vectorized
    # sweep); the scan then only does masked argmax/argmin picks.
    # (Measured alternative on v5e: reducing each slot to lax.top_k(32)
    # candidates shrinks the loop body 500x but the two (M, A) top_k
    # sweeps cost MORE than they save — 63.8 vs 52.7 ms/train-step at
    # KITTI scale — so the full-width masked argmax stays.)
    iou_all = jax.vmap(lambda b: _iou_one_vs_all(anchors_xyxy, b))(boxes_xyxy)
    dist_all = jnp.sum(
        (boxes_xywh[:, None, :] - anchors_xywh[None, :, :]) ** 2, axis=-1
    )  # (M, A)

    def body(taken, slot):
        iou, dist, box_xywh, is_valid = slot
        iou_free = jnp.where(taken, -jnp.inf, iou)
        best = jnp.argmax(iou_free)
        # fallback: nearest free anchor by squared distance in xywh space
        nearest = jnp.argmin(jnp.where(taken, jnp.inf, dist))
        chosen = jnp.where(iou_free[best] > 0.0, best, nearest).astype(jnp.int32)
        taken = jnp.where(
            is_valid, taken | (jnp.arange(num_anchors) == chosen), taken
        )
        a = anchors_xywh[chosen]
        deltas = jnp.stack(
            [
                (box_xywh[0] - a[0]) / a[2],
                (box_xywh[1] - a[1]) / a[3],
                jnp.log(box_xywh[2] / a[2]),
                jnp.log(box_xywh[3] / a[3]),
            ]
        )
        chosen = jnp.where(is_valid, chosen, num_anchors)
        return taken, (chosen, deltas)

    _, (chosen, deltas) = lax.scan(
        body,
        jnp.zeros((num_anchors,), dtype=bool),
        (iou_all, dist_all, boxes_xywh, valid),
    )
    return chosen, deltas, iou_all


def encode_annotations_device(
    class_ids, boxes_xyxy, count, anchors_xywh, anchors_xyxy, num_classes,
    match_iou: float = 0.0,
):
    """Dense per-anchor GT tensor ``(A, num_classes + 9)`` from padded slots.

    Layout matches the host encoder (core/matching.py encode_annotations):
    ``[mask(1) | gt_box xyxy(4) | gt_deltas(4) | one-hot class]``. Invalid
    slots scatter to index A and are dropped.

    ``match_iou > 0``: SSD-style multi-positive extras — every anchor whose
    best IoU against a valid GT slot is >= the threshold becomes an extra
    positive for that slot (first-max tie-break, greedy-unique assignments
    win conflicts), exactly mirroring the host encoder's extras pass.
    Parity: tests/test_device_data.py (test_encode_device_multi_positive).
    """
    num_anchors = anchors_xywh.shape[0]
    m = boxes_xyxy.shape[0]
    valid = jnp.arange(m) < count
    chosen, deltas, iou_all = match_anchors_device(
        boxes_xyxy, valid, anchors_xywh, anchors_xyxy
    )
    onehot = jnp.eye(num_classes, dtype=jnp.float32)[
        jnp.clip(class_ids, 0, num_classes - 1)
    ]
    rows = jnp.concatenate(
        [jnp.ones((m, 1)), boxes_xyxy, deltas, onehot], axis=1
    )
    gt = jnp.zeros((num_anchors, num_classes + 9), dtype=jnp.float32)
    gt = gt.at[chosen].set(rows, mode="drop")

    if match_iou > 0.0:
        # reuse the assignment pass's (M, A) IoU matrix — the extras pass
        # depends on exactly that geometry
        iou_all = jnp.where(valid[:, None], iou_all, -jnp.inf)
        best_slot = jnp.argmax(iou_all, axis=0)  # (A,) first-max tie-break
        best_iou = jnp.max(iou_all, axis=0)
        taken = jnp.zeros((num_anchors,), bool).at[chosen].set(True, mode="drop")
        extra = (best_iou >= match_iou) & ~taken  # (A,)

        boxes_xywh = _xyxy_to_xywh(boxes_xyxy)
        g = boxes_xywh[best_slot]  # (A, 4); garbage where ~extra — masked out
        a = anchors_xywh
        # clamp w/h before the log: padded/degenerate slots can carry
        # non-positive sizes and a NaN/-inf would survive the jnp.where
        # in value terms only if selected — clamping keeps the unselected
        # branch finite too (cheap insurance, bit-irrelevant when extra)
        extra_deltas = jnp.stack(
            [
                (g[:, 0] - a[:, 0]) / a[:, 2],
                (g[:, 1] - a[:, 1]) / a[:, 3],
                jnp.log(jnp.maximum(g[:, 2], EPSILON) / a[:, 2]),
                jnp.log(jnp.maximum(g[:, 3], EPSILON) / a[:, 3]),
            ],
            axis=1,
        )
        extra_rows = jnp.concatenate(
            [
                jnp.ones((num_anchors, 1)),
                boxes_xyxy[best_slot],
                extra_deltas,
                onehot[best_slot],
            ],
            axis=1,
        )
        gt = jnp.where(extra[:, None], extra_rows, gt)
    return gt
