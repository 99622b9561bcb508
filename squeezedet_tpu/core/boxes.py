"""Host-side (numpy) box math.

Conventions (kept bit-identical to the reference so checkpoints/labels are
interchangeable; see reference src/utils/boxes.py:12-34):

- ``xyxy``: [x1, y1, x2, y2] corner format, inclusive pixel coordinates.
- ``xywh``: [cx, cy, w, h] center format with the *+1 width convention*:
  ``w = x2 - x1 + 1`` (KITTI/devkit-style inclusive pixel boxes).
- IoU here uses the *exclusive* area ``(x2-x1)*(y2-y1)`` (reference
  src/utils/boxes.py:70-81); the +1 convention only enters xyxy<->xywh.

Device-side (jnp) equivalents live in :mod:`squeezedet_tpu.ops.box_ops`.
"""

from __future__ import annotations

import os

import numpy as np

EPSILON = 1e-10


def xyxy_to_xywh(boxes_xyxy: np.ndarray) -> np.ndarray:
    """Corner -> center format with the +1 width convention.

    Parity: reference src/utils/boxes.py:12-22.
    """
    b = np.asarray(boxes_xyxy)
    assert b.ndim == 2 and b.shape[1] == 4
    assert np.all(b[:, 0] < b[:, 2]) and np.all(b[:, 1] < b[:, 3])
    cx = (b[:, 0] + b[:, 2]) / 2.0
    cy = (b[:, 1] + b[:, 3]) / 2.0
    w = b[:, 2] - b[:, 0] + 1.0
    h = b[:, 3] - b[:, 1] + 1.0
    return np.stack([cx, cy, w, h], axis=1)


def xywh_to_xyxy(boxes_xywh: np.ndarray) -> np.ndarray:
    """Center -> corner format with the +1 width convention.

    Parity: reference src/utils/boxes.py:25-34.
    """
    b = np.asarray(boxes_xywh)
    assert b.ndim == 2 and b.shape[1] == 4
    assert np.all(b[:, 2:] > 0)
    half_w = 0.5 * (b[:, 2] - 1.0)
    half_h = 0.5 * (b[:, 3] - 1.0)
    return np.stack(
        [b[:, 0] - half_w, b[:, 1] - half_h, b[:, 0] + half_w, b[:, 1] + half_h],
        axis=1,
    )


def compute_overlaps_one(boxes: np.ndarray, box: np.ndarray) -> np.ndarray:
    """IoU of many ``boxes`` (N,4 xyxy) against a single ``box`` (4, xyxy).

    Uses exclusive areas (no +1). Parity: reference src/utils/boxes.py:70-81.
    """
    lr = np.maximum(
        np.minimum(boxes[:, 2], box[2]) - np.maximum(boxes[:, 0], box[0]), 0.0
    )
    tb = np.maximum(
        np.minimum(boxes[:, 3], box[3]) - np.maximum(boxes[:, 1], box[1]), 0.0
    )
    inter = lr * tb
    union = (
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        + (box[2] - box[0]) * (box[3] - box[1])
        - inter
    )
    return inter / (union + EPSILON)


def boxes_postprocess(boxes: np.ndarray, image_meta: dict) -> np.ndarray:
    """Invert the preprocessing chain, mapping detection boxes (xyxy, in model
    input coordinates) back to original-image coordinates.

    The inverse order is resize -> pad -> crop -> flip -> drift, matching the
    forward chain drift -> flip -> (resize | pad+crop) recorded in
    ``image_meta``. Parity: reference src/utils/boxes.py:138-168.
    """
    boxes = np.asarray(boxes, dtype=np.float32).copy()

    if "scales" in image_meta:
        boxes[:, [0, 2]] /= image_meta["scales"][1]
        boxes[:, [1, 3]] /= image_meta["scales"][0]

    if "padding" in image_meta:
        boxes[:, [0, 2]] -= image_meta["padding"][2]
        boxes[:, [1, 3]] -= image_meta["padding"][0]

    if "crops" in image_meta:
        boxes[:, [0, 2]] += image_meta["crops"][2]
        boxes[:, [1, 3]] += image_meta["crops"][0]

    if image_meta.get("flipped", False):
        image_width = (
            image_meta["drifted_size"][1]
            if "drifted_size" in image_meta
            else image_meta["orig_size"][1]
        )
        widths = boxes[:, 2] - boxes[:, 0] + 1.0
        boxes[:, 0] = image_width - 1 - boxes[:, 2]
        boxes[:, 2] = boxes[:, 0] + widths - 1.0

    if "drifts" in image_meta:
        boxes[:, [0, 2]] += image_meta["drifts"][1]
        boxes[:, [1, 3]] += image_meta["drifts"][0]

    return boxes


# 25-color palette for detection/GT visualization (matlab-style hues).
CLASS_COLORS = (
    255.0
    * np.array(
        [
            [0.850, 0.325, 0.098], [0.466, 0.674, 0.188], [0.098, 0.325, 0.850],
            [0.301, 0.745, 0.933], [0.635, 0.078, 0.184], [0.300, 0.300, 0.300],
            [0.600, 0.600, 0.600], [1.000, 0.000, 0.000], [1.000, 0.500, 0.000],
            [0.749, 0.749, 0.000], [0.000, 1.000, 0.000], [0.000, 0.000, 1.000],
            [0.667, 0.000, 1.000], [0.333, 0.333, 0.000], [0.333, 0.667, 0.000],
            [0.333, 1.000, 0.000], [0.667, 0.333, 0.000], [0.667, 0.667, 0.000],
            [0.667, 1.000, 0.000], [1.000, 0.333, 0.000], [1.000, 0.667, 0.000],
            [1.000, 1.000, 0.000], [0.000, 0.333, 0.500], [0.000, 0.667, 0.500],
            [0.000, 1.000, 0.500],
        ]
    )
).astype(np.uint8)


def visualize_boxes(
    image,
    class_ids,
    boxes,
    scores=None,
    class_names=None,
    save_path=None,
    show=False,
):
    """Draw labelled boxes onto ``image`` and save (or display) it.

    Used by the --debug 1/2 visualization paths (reference
    src/utils/boxes.py:171-198).
    """
    import cv2

    image = np.ascontiguousarray(image, dtype=np.uint8)
    font = cv2.FONT_HERSHEY_SIMPLEX
    for i in range(boxes.shape[0]):
        cid = int(class_ids[i])
        color = CLASS_COLORS[cid % len(CLASS_COLORS)].tolist()
        x1, y1, x2, y2 = (int(v) for v in boxes[i])
        image = cv2.rectangle(image, (x1, y1), (x2, y2), color, 2)

        name = class_names[cid] if class_names is not None else f"class_{cid}"
        text = f"{name} {scores[i]:.2f}" if scores is not None else name
        (tw, th), _ = cv2.getTextSize(text, font, 0.5, 1)
        image = cv2.rectangle(image, (x1, y1 - th - 8), (x1 + tw + 8, y1), color, -1)
        image = cv2.putText(
            image, text, (x1 + 4, y1 - 4), font, 0.5, (255, 255, 255), 1, cv2.LINE_AA
        )

    if show:  # pragma: no cover - interactive
        cv2.imshow(os.path.basename(save_path or "detections"), image[:, :, ::-1])
        cv2.waitKey()
    elif save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        cv2.imwrite(save_path, image[:, :, ::-1])
    return image
