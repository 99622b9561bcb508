"""On-device detection post-processing (decode -> top-K -> NMS -> threshold).

The reference does all of this on the host in Python, per image
(src/engine/detector.py:87-122: argsort top-64 -> per-class
torchvision.ops.nms(0.4) -> score > 0.3). Here the whole chain runs inside
the jitted predict step with static shapes, so only fixed-size
``(B, K, ...)`` tensors plus a keep-mask ever cross to the host.

The NMS is exact greedy (same keep set as torchvision's): boxes arrive sorted
by fused score descending (via `lax.top_k`); a box is kept iff no
higher-scored *kept* box of the same class overlaps it with IoU strictly
greater than the threshold. With K=64 the O(K^2) IoU matrix plus a K-step
`fori_loop` is vastly cheaper than a host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from squeezedet_tpu.models.head import Resolved, fuse_detections, resolve
from squeezedet_tpu.ops.box_ops import pairwise_iou


def greedy_nms_mask(
    boxes: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Class-aware greedy NMS keep mask for score-descending boxes (K, 4).

    Returns a (K,) bool mask. Equivalent to running torchvision NMS
    independently per class on the same ordering.
    """
    k = boxes.shape[0]
    iou = pairwise_iou(boxes)
    same_class = class_ids[:, None] == class_ids[None, :]
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]
    # suppress[i, j]: keeping i eliminates j (j later, same class, high IoU)
    suppress = (iou > iou_thresh) & same_class & later

    def body(i, alive):
        return jnp.where(alive[i], alive & ~suppress[i], alive)

    return lax.fori_loop(0, k, body, jnp.ones((k,), dtype=jnp.bool_))


@partial(
    jax.jit,
    static_argnames=(
        "input_size",
        "num_classes",
        "top_k",
        "nms_thresh",
        "score_thresh",
    ),
)
def postprocess(
    pred: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    input_size: tuple[int, int],
    num_classes: int,
    top_k: int = 64,
    nms_thresh: float = 0.4,
    score_thresh: float = 0.3,
) -> dict[str, jnp.ndarray]:
    """Raw head output -> final fixed-shape detections.

    :param pred: (B, A, C+5) raw ConvDet output.
    :param anchors: (A, 4) xywh anchors.
    :return: dict with ``boxes`` (B, K, 4) xyxy in input coords, ``scores``
        (B, K), ``class_ids`` (B, K), ``keep`` (B, K) bool — boxes sorted by
        score descending; entries with ``keep == False`` are
        suppressed/sub-threshold and must be discarded by the consumer.
    """
    resolved = resolve(pred, anchors, input_size, num_classes)
    det = fuse_detections(resolved)
    return _filter_detections(det, top_k, nms_thresh, score_thresh)


def _filter_detections(
    det: dict[str, jnp.ndarray],
    top_k: int,
    nms_thresh: float,
    score_thresh: float,
) -> dict[str, jnp.ndarray]:
    """Fused detections (B, N) -> top-K -> class-wise NMS -> threshold."""
    scores, order = lax.top_k(det["scores"], top_k)  # (B, K), sorted desc
    boxes = jnp.take_along_axis(det["boxes"], order[..., None], axis=1)
    class_ids = jnp.take_along_axis(det["class_ids"], order, axis=1)

    nms_keep = jax.vmap(greedy_nms_mask, in_axes=(0, 0, None))(
        boxes, class_ids, nms_thresh
    )
    keep = nms_keep & (scores > score_thresh)

    return {"boxes": boxes, "scores": scores, "class_ids": class_ids, "keep": keep}


def unflip_boxes(boxes: jnp.ndarray, image_width: int) -> jnp.ndarray:
    """Mirror xyxy boxes back across the vertical axis of a width-
    ``image_width`` image, with the same inclusive-pixel convention as the
    host flip (core/image.py:118-122; reference src/utils/image.py:53-74).
    An involution: ``unflip(unflip(b)) == b``."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [image_width - 1 - x2, y1, image_width - 1 - x1, y2], axis=-1
    )


@partial(
    jax.jit,
    static_argnames=(
        "input_size",
        "num_classes",
        "top_k",
        "nms_thresh",
        "score_thresh",
    ),
)
def postprocess_tta_flip(
    pred: jnp.ndarray,
    pred_flip: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    input_size: tuple[int, int],
    num_classes: int,
    top_k: int = 64,
    nms_thresh: float = 0.4,
    score_thresh: float = 0.3,
) -> dict[str, jnp.ndarray]:
    """Merge detections from an image and its horizontal mirror (flip TTA).

    ``pred_flip`` is the raw head output of the *mirrored* batch; its
    decoded boxes are mirrored back into the original frame, the two
    candidate sets are unioned along the anchor axis (B, 2A), and the
    standard top-K/NMS/threshold filter dedupes agreeing boxes (the same
    object found by both passes collapses to the higher-scored one). The
    output contract is identical to :func:`postprocess`, so every consumer
    (Detector tail, serving export) works unchanged. TTA has no reference
    counterpart — it is a capability surplus of this framework.
    """
    det = fuse_detections(resolve(pred, anchors, input_size, num_classes))
    det_f = fuse_detections(resolve(pred_flip, anchors, input_size, num_classes))
    det_f = {**det_f, "boxes": unflip_boxes(det_f["boxes"], input_size[1])}

    merged = {
        k: jnp.concatenate([det[k], det_f[k]], axis=1)
        for k in ("boxes", "scores", "class_ids")
    }
    return _filter_detections(merged, top_k, nms_thresh, score_thresh)
