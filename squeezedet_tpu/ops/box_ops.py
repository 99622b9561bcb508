"""Device-side (jnp) box math — batched, static-shape, jit-safe.

Numerics mirror the host/tensor math of the reference
(src/model/modules.py:6-68) so that decoded boxes and IoUs agree bitwise in
fp32: xyxy<->xywh uses the +1 width convention, IoU uses exclusive areas, and
``safe_softmax`` subtracts the row max before exponentiation.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-10


def xywh_to_xyxy(boxes_xywh: jnp.ndarray) -> jnp.ndarray:
    """Center -> corner format (+1 width convention), any leading dims."""
    cx, cy, w, h = jnp.split(boxes_xywh, 4, axis=-1)
    half_w = 0.5 * (w - 1.0)
    half_h = 0.5 * (h - 1.0)
    return jnp.concatenate(
        [cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1
    )


def xyxy_to_xywh(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Corner -> center format (+1 width convention), any leading dims."""
    x1, y1, x2, y2 = jnp.split(boxes_xyxy, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1 + 1.0, y2 - y1 + 1.0],
        axis=-1,
    )


def deltas_to_boxes(
    deltas: jnp.ndarray,
    anchors_xywh: jnp.ndarray,
    input_size: tuple[int, int],
    clip: bool = True,
) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas against anchors into clamped xyxy boxes.

    ``x = ax + aw*dx``, ``w = aw * exp(dw)`` (and likewise for y/h), then
    corners are clamped to ``[0, input-1]``. Parity: reference
    src/model/modules.py:27-45.

    ``clip=False`` skips the clamp: needed by the CIoU loss, where a box
    that decodes fully outside the image must keep nonzero width/height
    (a clamped one collapses to a corner point, which both kills the
    gradient through the clip and makes arctan2(0, 0)'s backward NaN)
    and a real center-distance gradient pulling it back in.

    :param deltas: (..., A, 4)
    :param anchors_xywh: (A, 4) — broadcast over leading dims.
    :param input_size: (height, width) used for clamping.
    """
    ax, ay, aw, ah = jnp.split(anchors_xywh, 4, axis=-1)
    dx, dy, dw, dh = jnp.split(deltas, 4, axis=-1)
    # exp is bounded at 50 (e^50 ~ 5e21): a size delta past ~89 overflows
    # exp to inf, and backward through the image clamp then multiplies a
    # zero cotangent by exp's inf derivative -> NaN gradients. Clamping
    # the exponent is invisible for any box that could matter (e^50 anchor
    # widths is astronomically out of frame) and keeps training NaN-free
    # even if the head momentarily produces wild deltas.
    dw = jnp.minimum(dw, 50.0)
    dh = jnp.minimum(dh, 50.0)
    boxes_xywh = jnp.concatenate(
        [ax + aw * dx, ay + ah * dy, aw * jnp.exp(dw), ah * jnp.exp(dh)],
        axis=-1,
    )
    boxes = xywh_to_xyxy(boxes_xywh)
    if not clip:
        return boxes
    h, w = input_size
    lo = jnp.zeros((4,), dtype=boxes.dtype)
    hi = jnp.array([w - 1, h - 1, w - 1, h - 1], dtype=boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def compute_overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU between equal-shaped box tensors (..., 4), xyxy.

    Returns shape (..., 1). Parity: reference src/model/modules.py:48-63.
    """
    lr = jnp.maximum(
        jnp.minimum(boxes1[..., 2:3], boxes2[..., 2:3])
        - jnp.maximum(boxes1[..., 0:1], boxes2[..., 0:1]),
        0.0,
    )
    tb = jnp.maximum(
        jnp.minimum(boxes1[..., 3:4], boxes2[..., 3:4])
        - jnp.maximum(boxes1[..., 1:2], boxes2[..., 1:2]),
        0.0,
    )
    inter = lr * tb
    union = (
        (boxes1[..., 2:3] - boxes1[..., 0:1]) * (boxes1[..., 3:4] - boxes1[..., 1:2])
        + (boxes2[..., 2:3] - boxes2[..., 0:1]) * (boxes2[..., 3:4] - boxes2[..., 1:2])
        - inter
    )
    return inter / (union + EPSILON)


def pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU matrix for a (K, 4) xyxy box set, exclusive areas.

    This is the torchvision-NMS IoU (no +1), used by the on-device NMS
    (reference relies on torchvision.ops.nms, src/engine/detector.py:104).
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    lr = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :]),
        0.0,
    )
    tb = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :]),
        0.0,
    )
    inter = lr * tb
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, EPSILON)


def safe_softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Max-subtracted softmax. Parity: reference src/model/modules.py:66-68."""
    exp = jnp.exp(logits - jnp.max(logits, axis=axis, keepdims=True))
    return exp / jnp.sum(exp, axis=axis, keepdims=True)
