"""Host-side (numpy/cv2) image pipeline: augmentations and their inverses.

Augmentations run on the host because drift produces variable image sizes
before the fixed-size resize — XLA must only ever see the static
``input_size``. Every op records its parameters into ``image_meta`` so
detections can be mapped back to original-image coordinates
(:func:`squeezedet_tpu.core.boxes.boxes_postprocess`) and images can be
un-processed for visualization (:func:`image_postprocess`).

Semantics are kept identical to the reference (src/utils/image.py:9-181):
whiten -> drift -> flip -> (resize | crop_or_pad), with boxes in xyxy format
updated in lock-step.
"""

from __future__ import annotations

import numpy as np

try:  # cv2 is the fast path; PIL fallback keeps the package importable.
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _resize_image(image: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (height, width)."""
    th, tw = int(target_hw[0]), int(target_hw[1])
    if _HAS_CV2:
        return cv2.resize(image, (tw, th))
    from PIL import Image  # pragma: no cover

    chans = [
        np.asarray(
            Image.fromarray(image[..., c].astype(np.float32)).resize(
                (tw, th), Image.BILINEAR
            )
        )
        for c in range(image.shape[2])
    ]
    return np.stack(chans, axis=-1)


def whiten(image, image_meta, mean=0.0, std=1.0):
    """Normalize by dataset RGB stats; records them for inversion."""
    image = (image - mean) / std
    image_meta.update({"rgb_mean": mean, "rgb_std": std})
    return image, image_meta


def drift(image, image_meta, prob=0.0, boxes=None, rng=np.random, pad_value=0.0):
    """Random translation augmentation.

    Shifts content by (dy, dx) with dy in [-H/4, min(H/4, min_box_y)) and dx
    in [-W/8, min(W/8, min_box_x)); the exposed region is filled with
    ``pad_value`` (zero in whitened space; the raw-uint8 fast pipeline
    passes the dataset RGB mean, which whitens to ~zero on device) and the
    canvas grows/shrinks to (H-dy, W-dx). Boxes shift with the content.
    Produces a *variable-size* image — must precede the fixed-size resize.
    Parity: reference src/utils/image.py:22-50.
    """
    drifts = np.array([0, 0], dtype=np.int32)
    drifted_size = np.array(image.shape, dtype=np.int32)
    if rng.uniform() < prob:
        max_drift_y = image_meta["orig_size"][0] // 4
        max_drift_x = image_meta["orig_size"][1] // 8
        # images with no labeled objects (e.g. only DontCare rows — real
        # KITTI has them) drift freely; the reference crashes here
        has_boxes = boxes is not None and len(boxes) > 0
        max_boxes_y = min(boxes[:, 1]) if has_boxes else max_drift_y
        max_boxes_x = min(boxes[:, 0]) if has_boxes else max_drift_x
        dy = rng.randint(-max_drift_y, min(max_drift_y, max_boxes_y))
        dx = rng.randint(-max_drift_x, min(max_drift_x, max_boxes_x))
        drifts = np.array([dy, dx], dtype=np.int32)

        new_h = image_meta["orig_size"][0] - dy
        new_w = image_meta["orig_size"][1] - dx
        src_y, src_x = max(dy, 0), max(dx, 0)
        dst_y, dst_x = max(-dy, 0), max(-dx, 0)

        if dst_y == 0 and dst_x == 0:
            # pure crop: a view, no copy or fill
            image = image[src_y:, src_x:, :]
        else:
            drifted = np.empty((new_h, new_w, 3), dtype=image.dtype)
            drifted[dst_y:, dst_x:, :] = image[src_y:, src_x:, :]
            # fill only the exposed strips, not the whole canvas
            if dst_y:
                drifted[:dst_y, :, :] = pad_value
            if dst_x:
                drifted[dst_y:, :dst_x, :] = pad_value
            image = drifted
        drifted_size = np.array(image.shape, dtype=np.int32)

        if boxes is not None:
            boxes[:, [0, 2]] -= dx
            boxes[:, [1, 3]] -= dy

    image_meta.update({"drifts": drifts, "drifted_size": drifted_size})
    return image, image_meta, boxes


def flip(image, image_meta, prob=0.0, boxes=None, rng=np.random):
    """Horizontal flip; boxes mirrored with the inclusive-pixel convention.

    Parity: reference src/utils/image.py:53-74.
    """
    flipped = False
    if rng.uniform() < prob:
        flipped = True
        if _HAS_CV2 and image.flags.c_contiguous:
            image = cv2.flip(image, 1)  # SIMD horizontal flip
        else:
            image = image[:, ::-1, :].copy()

    if flipped and boxes is not None:
        image_width = image.shape[1]
        widths = boxes[:, 2] - boxes[:, 0]
        boxes[:, 0] = image_width - 1 - boxes[:, 2]
        boxes[:, 2] = boxes[:, 0] + widths

    image_meta.update({"flipped": flipped})
    return image, image_meta, boxes


def resize(image, image_meta, target_size, boxes=None):
    """Anisotropic bilinear resize to ``target_size`` (h, w); scales boxes.

    Parity: reference src/utils/image.py:77-88.
    """
    height, width = image.shape[:2]
    scales = np.array(
        [target_size[0] / height, target_size[1] / width], dtype=np.float32
    )
    image = _resize_image(image, target_size)

    if boxes is not None:
        boxes[:, [0, 2]] *= scales[1]
        boxes[:, [1, 3]] *= scales[0]

    image_meta.update({"scales": scales})
    return image, image_meta, boxes


def crop_or_pad(image, image_meta, target_size, boxes=None, pad_value=0.0):
    """Center pad-then-crop to ``target_size`` (the ``--forbid_resize`` path).

    Parity: reference src/utils/image.py:91-123. padding/crops are
    (top, bottom, left, right).
    """
    padding = np.zeros(4, dtype=np.int16)
    crops = np.zeros(4, dtype=np.int16)

    height, width = image.shape[:2]
    target_height, target_width = target_size

    if height < target_height:
        padding[0] = (target_height - height) // 2
        padding[1] = (target_height - height) - padding[0]
    elif height > target_height:
        crops[0] = (height - target_height) // 2
        crops[1] = (height - target_height) - crops[0]

    if width < target_width:
        padding[2] = (target_width - width) // 2
        padding[3] = (target_width - width) - padding[2]
    elif width > target_width:
        crops[2] = (width - target_width) // 2
        crops[3] = (width - target_width) - crops[2]

    image, boxes = pad(image, padding, boxes=boxes, pad_value=pad_value)
    image, boxes = crop(image, crops, boxes=boxes)

    image_meta.update({"padding": padding, "crops": crops})
    return image, image_meta, boxes


def random_erase(image, image_meta, prob=0.0, rng=np.random, fill=0.0,
                 area_range=(0.02, 0.2), aspect_range=(0.3, 1.0 / 0.3),
                 copy_on_write=False):
    """Random-erasing occlusion augmentation (Zhong et al. 2017).

    With probability ``prob``, fills one rectangle (area fraction
    ~ U(area_range), aspect ~ logU(aspect_range), placed uniformly inside
    the image) with ``fill`` — zero in whitened space, or the dataset RGB
    mean on the raw-uint8 path, which whitens to ~zero on device. Applied
    AFTER the fixed-size resize so the erased fraction is resolution-
    independent. GT boxes are deliberately untouched: the occluded object
    keeps its full-extent label, so the model is trained to predict amodal
    boxes from partial evidence (the occ-2 failure mode, EVIDENCE.md).
    No reference counterpart; device twin ops/augment.py
    sample_erase_params/apply_erase (parity-tested in tests/test_erase.py).
    """
    rect = np.zeros(4, dtype=np.int32)  # y1, x1, y2, x2; zeros = no erase
    if rng.uniform() < prob:
        h, w = image.shape[:2]
        s = rng.uniform(*area_range) * h * w
        r = np.exp(rng.uniform(np.log(aspect_range[0]), np.log(aspect_range[1])))
        eh = min(int(round(np.sqrt(s * r))), h)
        ew = min(int(round(np.sqrt(s / r))), w)
        if eh > 0 and ew > 0:
            y = rng.randint(0, h - eh + 1)
            x = rng.randint(0, w - ew + 1)
            # copy_on_write: the raw-uint8 pipeline can reach here with the
            # dataset's RAM-cached array itself (fast_pipeline +
            # forbid_resize leaves pad/crop as no-op/view) — writing the
            # rect in place would corrupt the cache for every later epoch
            if copy_on_write or not image.flags.writeable:
                image = image.copy()
            image[y : y + eh, x : x + ew, :] = fill
            rect = np.array([y, x, y + eh, x + ew], dtype=np.int32)
    image_meta.update({"erased": rect})
    return image, image_meta


def pad(image, padding, boxes=None, pad_value=0.0):
    """Pad by (top, bottom, left, right) with ``pad_value``; shifts boxes."""
    padding = np.asarray(padding)
    if not np.all(padding == 0):
        out = np.empty(
            (
                image.shape[0] + padding[0] + padding[1],
                image.shape[1] + padding[2] + padding[3],
                image.shape[2],
            ),
            dtype=image.dtype,
        )
        out[...] = pad_value
        out[
            padding[0] : padding[0] + image.shape[0],
            padding[2] : padding[2] + image.shape[1],
        ] = image
        image = out
        if boxes is not None:
            boxes[:, [0, 2]] += padding[2]
            boxes[:, [1, 3]] += padding[0]
    return image, boxes


def crop(image, crops, boxes=None):
    """Crop by (top, bottom, left, right); clamps shifted boxes at zero."""
    crops = np.asarray(crops)
    if not np.all(crops == 0):
        image = image[crops[0] : image.shape[0] - crops[1], :, :]
        image = image[:, crops[2] : image.shape[1] - crops[3], :]
        if boxes is not None:
            boxes[:, [0, 2]] -= crops[2]
            boxes[:, [1, 3]] -= crops[0]
            boxes = np.maximum(boxes, 0.0)
    return image, boxes


def image_postprocess(image, image_meta):
    """Invert the preprocessing chain for visualization.

    Parity: reference src/utils/image.py:161-181.
    """
    if "scales" in image_meta:
        orig_hw = image_meta["orig_size"]
        image = _resize_image(image, (int(orig_hw[0]), int(orig_hw[1])))

    if "padding" in image_meta:
        image = crop(image, image_meta["padding"])[0]

    if "crops" in image_meta:
        image = pad(image, image_meta["crops"])[0]

    if image_meta.get("flipped", False):
        image = image[:, ::-1, :]

    if "drifts" in image_meta:
        padding = [image_meta["drifts"][0], 0, image_meta["drifts"][1], 0]
        image = pad(image, padding)[0]

    if "rgb_mean" in image_meta and "rgb_std" in image_meta:
        image = image * image_meta["rgb_std"] + image_meta["rgb_mean"]

    return image
