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


def soft_nms_rescore(
    boxes: jnp.ndarray,
    class_ids: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    sigma: float,
    method: str,
) -> jnp.ndarray:
    """Class-aware Soft-NMS score decay (Bodla et al., ICCV 2017) for a
    (K, 4) box set. Instead of greedy_nms_mask's hard suppression, each
    selected box DECAYS the scores of overlapping same-class boxes:

    - ``soft_linear``: ``s *= 1 - iou`` when ``iou > iou_thresh``;
    - ``soft_gauss``:  ``s *= exp(-iou^2 / sigma)`` (no threshold gate).

    Runs the exact sequential algorithm under static shapes: a K-step
    ``lax.scan`` selects the highest-scoring unprocessed box each step
    (selection order can change as scores decay — that reordering is the
    algorithm, not an approximation) and decays the remainder. A box's
    score freezes at selection, so the returned (K,) vector holds each
    box's final Soft-NMS score; downstream the usual ``score_thresh``
    replaces the hard keep mask. No reference counterpart (the reference
    is hard torchvision NMS, src/engine/detector.py:104) — opt-in via
    ``--nms_method``. Parity: tests/test_soft_nms.py vs an independent
    sequential numpy oracle.
    """
    k = boxes.shape[0]
    iou = pairwise_iou(boxes)
    same_class = class_ids[:, None] == class_ids[None, :]

    def body(carry, _):
        scores, processed = carry
        # scores are sigmoid*softmax products in [0, 1]: -1 is a safe
        # "already selected" sentinel for the argmax
        i = jnp.argmax(jnp.where(processed, -1.0, scores))
        processed = processed.at[i].set(True)
        if method == "soft_linear":
            w = jnp.where(iou[i] > iou_thresh, 1.0 - iou[i], 1.0)
        elif method == "soft_gauss":
            w = jnp.exp(-(iou[i] ** 2) / sigma)
        else:  # pragma: no cover - guarded by _filter_detections
            raise ValueError(f"unknown soft-NMS method {method!r}")
        w = jnp.where(same_class[i] & ~processed, w, 1.0)
        return (scores * w, processed), None

    (scores, _), _ = lax.scan(
        body, (scores, jnp.zeros((k,), dtype=jnp.bool_)), None, length=k
    )
    return scores


@partial(
    jax.jit,
    static_argnames=(
        "input_size",
        "num_classes",
        "top_k",
        "nms_thresh",
        "score_thresh",
        "nms_method",
        "soft_nms_sigma",
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
    nms_method: str = "hard",
    soft_nms_sigma: float = 0.5,
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
    return _filter_detections(
        det, top_k, nms_thresh, score_thresh, nms_method, soft_nms_sigma
    )


def _filter_detections(
    det: dict[str, jnp.ndarray],
    top_k: int,
    nms_thresh: float,
    score_thresh: float,
    nms_method: str = "hard",
    soft_nms_sigma: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """Fused detections (B, N) -> top-K -> class-wise NMS -> threshold.

    ``nms_method='hard'`` keeps the reference-parity greedy suppression;
    the ``soft_*`` methods decay scores instead (soft_nms_rescore) and the
    score threshold does the discarding — output stays score-descending in
    the DECAYED scores, so the fixed-shape contract is unchanged."""
    scores, order = lax.top_k(det["scores"], top_k)  # (B, K), sorted desc
    boxes = jnp.take_along_axis(det["boxes"], order[..., None], axis=1)
    class_ids = jnp.take_along_axis(det["class_ids"], order, axis=1)

    if nms_method == "hard":
        nms_keep = jax.vmap(greedy_nms_mask, in_axes=(0, 0, None))(
            boxes, class_ids, nms_thresh
        )
        keep = nms_keep & (scores > score_thresh)
        return {
            "boxes": boxes, "scores": scores,
            "class_ids": class_ids, "keep": keep,
        }

    scores = jax.vmap(soft_nms_rescore, in_axes=(0, 0, 0, None, None, None))(
        boxes, class_ids, scores, nms_thresh, soft_nms_sigma, nms_method
    )
    scores, order = lax.top_k(scores, top_k)  # re-sort by decayed score
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    class_ids = jnp.take_along_axis(class_ids, order, axis=1)
    keep = scores > score_thresh
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
        "nms_method",
        "soft_nms_sigma",
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
    nms_method: str = "hard",
    soft_nms_sigma: float = 0.5,
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
    return _filter_detections(
        merged, top_k, nms_thresh, score_thresh, nms_method, soft_nms_sigma
    )
