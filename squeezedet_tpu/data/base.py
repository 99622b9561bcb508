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
from squeezedet_tpu.data.imageio import read_image


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

    @staticmethod
    def load_anchor_seeds(cfg, default: np.ndarray) -> np.ndarray:
        """Dataset anchor seeds, overridable by --anchor_seeds_file: a
        (K, 2) whitespace table of (w, h) pixels from
        tools/compute_dataset_seed_anchors.py. K may differ from the
        default's 9 — the head width follows anchors_per_grid."""
        path = getattr(cfg, "anchor_seeds_file", "")
        if not path:
            return default
        raw = np.loadtxt(path, dtype=np.float32)
        if raw.size == 0 or raw.size % 2 != 0:
            raise ValueError(
                f"--anchor_seeds_file {path}: need a (K, 2) table of "
                f"(w, h) pixels, got {raw.size} values"
            )
        seeds = raw.reshape(-1, 2)
        if not np.all(seeds > 0):
            bad = seeds[~np.all(seeds > 0, axis=1)][0]
            raise ValueError(
                f"--anchor_seeds_file {path}: every (w, h) must be "
                f"positive, found {tuple(bad)}"
            )
        return seeds

    # -- template methods -------------------------------------------------
    def get_sample_ids(self):
        raise NotImplementedError

    def load_image(self, index: int):
        image, image_id = self._load_cached(index)
        return image.astype(np.float32), image_id

    def load_image_uint8(self, index: int):
        """Raw-bytes variant for the uint8 fast pipeline; served from the
        decoded RAM cache without the float conversion. Datasets that only
        implement ``load_image`` (no ``_image_source``) fall back to the
        float path + cast."""
        try:
            return self._load_cached(index)
        except NotImplementedError:
            image, image_id = self.load_image(index)
            return np.clip(image, 0, 255).astype(np.uint8), image_id

    def _image_source(self, index: int) -> tuple[str, Any]:
        """(image file path, image id) for ``_load_cached`` — the one hook
        concrete datasets implement for image IO (kitti.py, coco.py)."""
        raise NotImplementedError

    def _load_cached(self, index: int):
        """Decode-once uint8 image, served from the RAM cache when the
        dataset enabled one (``cfg.cache_images``). NOTE: returns the
        cached array itself — callers must not write to it (the preprocess
        chain copies before any in-place mutation)."""
        path, image_id = self._image_source(index)
        cache = getattr(self, "_image_cache", None)
        if cache is not None:
            cached = cache.get(index)
            if cached is not None:
                return cached, image_id
        image = np.clip(read_image(path), 0, 255).astype(np.uint8)
        if cache is not None:
            cache[index] = image
        return image, image_id

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
            # raw-uint8 mode (whiten_input=False) may hand us the dataset's
            # cached array or a view of it — never write the erase in place
            image, image_meta = random_erase(
                image, image_meta, erase_prob,
                fill=pad_value if not whiten_input else 0.0,
                copy_on_write=not whiten_input,
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
