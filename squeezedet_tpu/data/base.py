"""Dataset base: the host-side sample pipeline template.

Mirrors the reference's template-method design (src/datasets/base.py:10-91)
but produces numpy batches for `device_put` instead of torch tensors:

``load_image -> load_annotations -> preprocess (clip, whiten, drift, flip,
resize | crop_or_pad) -> encode_annotations`` giving
``{'image' (H,W,3 NHWC float32), 'image_meta', 'gt' (A, C+9)}``.

Augmentations stay on the host because drift produces variable-size images
before the fixed-size resize; the device only ever sees static shapes.
Images remain NHWC — the TPU-native layout — end to end (the reference
transposes to NCHW for torch; we never do).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from squeezedet_tpu.core.boxes import visualize_boxes  # noqa: F401 (re-export)
from squeezedet_tpu.core.image import (
    crop_or_pad,
    drift,
    flip,
    random_erase,
    resize,
    whiten,
)
from squeezedet_tpu.core.matching import encode_annotations


class BaseDataset:
    # subclasses must set these class/instance attributes
    input_size: tuple[int, int]
    class_names: tuple[str, ...]
    rgb_mean: np.ndarray
    rgb_std: np.ndarray
    num_classes: int
    anchors: np.ndarray
    anchors_per_grid: int
    num_anchors: int
    sample_ids: tuple[str, ...]

    def __init__(self, phase: str, cfg):
        self.phase = phase
        self.cfg = cfg

    # -- template methods -------------------------------------------------
    def get_sample_ids(self):
        raise NotImplementedError

    def load_image(self, index: int):
        raise NotImplementedError

    def load_image_uint8(self, index: int):
        """Raw-bytes variant for the uint8 fast pipeline; datasets with a
        decoded cache can serve it without the float conversion."""
        image, image_id = self.load_image(index)
        return np.clip(image, 0, 255).astype(np.uint8), image_id

    def load_annotations(self, index: int):
        raise NotImplementedError

    def save_results(self, results):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError

    # -- pipeline ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.sample_ids)

    def preprocess(self, image, image_meta, boxes=None, whiten_input=True):
        """Whiten + (train-only) drift/flip + resize-or-crop to input_size.

        With ``whiten_input=False`` the image stays in raw 0-255 space (the
        uint8 serving path folds whitening into the stem conv instead —
        models.squeezedet.fold_whitening).
        """
        if boxes is not None:
            boxes[:, [0, 2]] = np.clip(
                boxes[:, [0, 2]], 0.0, image_meta["orig_size"][1] - 1.0
            )
            boxes[:, [1, 3]] = np.clip(
                boxes[:, [1, 3]], 0.0, image_meta["orig_size"][0] - 1.0
            )

        drift_prob = self.cfg.drift_prob if self.phase == "train" else 0.0
        flip_prob = self.cfg.flip_prob if self.phase == "train" else 0.0

        if whiten_input:
            image, image_meta = whiten(image, image_meta, self.rgb_mean, self.rgb_std)
            pad_value = 0.0
        else:
            # raw space: pad with the dataset mean, which whitens to ~zero
            # on device (matching the reference's post-whiten zero padding)
            pad_value = np.round(np.ravel(self.rgb_mean))
        image, image_meta, boxes = drift(
            image, image_meta, drift_prob, boxes, pad_value=pad_value
        )
        image, image_meta, boxes = flip(image, image_meta, flip_prob, boxes)
        if self.cfg.forbid_resize:
            image, image_meta, boxes = crop_or_pad(
                image, image_meta, self.input_size, boxes, pad_value=pad_value
            )
        else:
            image, image_meta, boxes = resize(image, image_meta, self.input_size, boxes)
        erase_prob = (
            getattr(self.cfg, "erase_prob", 0.0) if self.phase == "train" else 0.0
        )
        if erase_prob > 0.0:
            image, image_meta = random_erase(
                image, image_meta, erase_prob,
                fill=pad_value if not whiten_input else 0.0,
            )
        return image, image_meta, boxes

    def __getitem__(self, index: int) -> dict[str, Any]:
        fast = bool(getattr(self.cfg, "fast_pipeline", False))
        if fast:
            image, image_id = self.load_image_uint8(index)
        else:
            image, image_id = self.load_image(index)
        gt_class_ids, gt_boxes = self.load_annotations(index)

        image_meta = {
            "index": index,
            "image_id": image_id,
            "orig_size": np.array(image.shape, dtype=np.int32),
        }
        image, image_meta, gt_boxes = self.preprocess(
            image, image_meta, gt_boxes, whiten_input=not fast
        )

        if gt_boxes is not None and len(gt_boxes):
            # cropping (forbid_resize) clamps boxes at the canvas edge and
            # can collapse ones that left the frame; degenerate boxes would
            # poison the matcher (the reference crashes on them instead)
            valid = (gt_boxes[:, 0] < gt_boxes[:, 2]) & (
                gt_boxes[:, 1] < gt_boxes[:, 3]
            )
            gt_boxes = gt_boxes[valid]
            gt_class_ids = np.asarray(gt_class_ids)[valid]
        gt = encode_annotations(
            gt_class_ids, gt_boxes, self.anchors, self.num_classes,
            match_iou=getattr(self.cfg, "match_iou", 0.0),
        )

        if self.cfg.debug == 1:
            vis = image * image_meta["rgb_std"] + image_meta["rgb_mean"]
            save_path = os.path.join(
                self.cfg.debug_dir, str(image_meta["image_id"]) + ".png"
            )
            visualize_boxes(
                vis, gt_class_ids, gt_boxes,
                class_names=self.class_names, save_path=save_path,
            )

        return {
            "image": np.ascontiguousarray(
                image, dtype=np.uint8 if fast else np.float32
            ),
            "image_meta": image_meta,
            "gt": gt,
        }

    def inference_item(self, index: int, raw: bool = False) -> dict[str, Any]:
        """Annotation-free view for eval/demo (reference DataWrapper,
        src/engine/detector.py:125-145). With ``raw=True`` the image skips
        whitening and ships as uint8 (serving fast path)."""
        image, image_id = self.load_image(index)
        image_meta = {
            "index": index,
            "image_id": image_id,
            "orig_size": np.array(image.shape, dtype=np.int32),
        }
        image, image_meta, _ = self.preprocess(
            image, image_meta, None, whiten_input=not raw
        )
        dtype = np.uint8 if raw else np.float32
        return {
            "image": np.ascontiguousarray(np.clip(image, 0, 255) if raw else image, dtype=dtype),
            "image_meta": image_meta,
        }
