"""Device-resident dataset staging: decode once, keep everything in HBM.

The axon TPU tunnel makes per-batch H2D the dominant training cost (and is
intermittently bandwidth-degraded once executes are in flight — see
CLAUDE.md). This module sidesteps the host<->device data path entirely:
decoded uint8 images plus padded GT arrays are uploaded to the device(s)
ONCE, before the first execute, and every epoch then runs fully on-device
(gather -> warp/augment -> GT-encode -> step; parallel/epoch.py).

Host-side the decoded arrays are cached as .npy next to the dataset so a
restart skips the (minutes-long on this 1-core host) PNG decode sweep.

Replaces the reference's per-worker torch DataLoader pipeline
(src/train.py:40-50) for datasets that fit in HBM — KITTI train is ~4.9 GB
as uint8 at 375x1242, comfortably inside a single v5e's 16 GB.
"""

from __future__ import annotations

import json
import os

import numpy as np

# Floor for the auto-sized per-frame object capacity: staging pads GT to
# max(16, observed max) slots so small/synthetic datasets keep a stable
# cache shape while crowded real-KITTI frames (>16 labeled cars in parking
# scenes) size the arrays up instead of crashing.
MIN_OBJECT_SLOTS = 16


class StagedArrays:
    """Host numpy staging of one dataset phase (train or val)."""

    def __init__(self, images, boxes, class_ids, counts, sizes, sample_ids):
        self.images = images        # (N, Hs, Ws, 3) uint8
        self.boxes = boxes          # (N, M, 4) float32 xyxy, pre-clipped
        self.class_ids = class_ids  # (N, M) int32
        self.counts = counts        # (N,) int32
        self.sizes = sizes          # (N, 2) int32 valid (H, W)
        self.sample_ids = sample_ids

    def __len__(self):
        return self.images.shape[0]


def _cache_dir(dataset) -> str:
    return os.path.join(dataset.data_dir, "cache", dataset.phase)


def _build(dataset, max_objects: int | None) -> StagedArrays:
    """``max_objects`` None sizes the GT arrays from the dataset's observed
    per-frame maximum (floored at MIN_OBJECT_SLOTS); an explicit value is a
    hard capacity and staging fails loudly if any frame exceeds it."""
    n = len(dataset)
    sizes = np.zeros((n, 2), dtype=np.int32)
    raw_images = []
    all_boxes, all_cls = [], []

    for i in range(n):
        img, _ = dataset.load_image_uint8(i)
        raw_images.append(img)
        sizes[i] = img.shape[:2]
        cls, bxs = dataset.load_annotations(i)
        if len(bxs):
            # same clip the host pipeline applies before augmentation
            # (data/base.py preprocess), then drop degenerate boxes
            bxs = np.asarray(bxs, np.float32).copy()
            bxs[:, [0, 2]] = np.clip(bxs[:, [0, 2]], 0.0, img.shape[1] - 1.0)
            bxs[:, [1, 3]] = np.clip(bxs[:, [1, 3]], 0.0, img.shape[0] - 1.0)
            keep = (bxs[:, 0] < bxs[:, 2]) & (bxs[:, 1] < bxs[:, 3])
            bxs, cls = bxs[keep], np.asarray(cls)[keep]
        else:
            bxs, cls = np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
        all_boxes.append(bxs)
        all_cls.append(cls)

    observed = max((len(b) for b in all_boxes), default=0)
    if max_objects is None:
        max_objects = max(MIN_OBJECT_SLOTS, observed)
    elif observed > max_objects:
        i = int(np.argmax([len(b) for b in all_boxes]))
        raise ValueError(
            f"sample {dataset.sample_ids[i]} has {observed} objects "
            f"> max_objects={max_objects}; drop --max_objects to auto-size"
        )

    boxes = np.zeros((n, max_objects, 4), dtype=np.float32)
    class_ids = np.zeros((n, max_objects), dtype=np.int32)
    counts = np.zeros((n,), dtype=np.int32)
    for i, (bxs, cls) in enumerate(zip(all_boxes, all_cls)):
        m = len(bxs)
        boxes[i, :m] = bxs
        class_ids[i, :m] = cls
        counts[i] = m

    hs, ws = sizes.max(axis=0)
    images = np.zeros((n, hs, ws, 3), dtype=np.uint8)
    for i, img in enumerate(raw_images):
        images[i, : img.shape[0], : img.shape[1]] = img
    return StagedArrays(
        images, boxes, class_ids, counts, sizes, list(dataset.sample_ids)
    )


def stage_dataset(
    dataset, max_objects: int | None = None, use_cache: bool = True
) -> StagedArrays:
    """Build (or load from the .npy cache) the staged arrays for a dataset.

    ``max_objects`` None (the default) auto-sizes GT capacity from the
    dataset; any cache built from the same sample ids is then reusable
    (its capacity was proven sufficient when it was written)."""
    cdir = _cache_dir(dataset)
    meta_path = os.path.join(cdir, "meta.json")
    if use_cache and os.path.exists(meta_path):
        with open(meta_path) as fp:
            meta = json.load(fp)
        if meta.get("sample_ids") == list(dataset.sample_ids) and (
            max_objects is None or meta.get("max_objects") == max_objects
        ):
            return StagedArrays(
                np.load(os.path.join(cdir, "images.npy"), mmap_mode="r"),
                np.load(os.path.join(cdir, "boxes.npy")),
                np.load(os.path.join(cdir, "class_ids.npy")),
                np.load(os.path.join(cdir, "counts.npy")),
                np.load(os.path.join(cdir, "sizes.npy")),
                list(dataset.sample_ids),
            )

    staged = _build(dataset, max_objects)
    if use_cache:
        os.makedirs(cdir, exist_ok=True)
        np.save(os.path.join(cdir, "images.npy"), staged.images)
        np.save(os.path.join(cdir, "boxes.npy"), staged.boxes)
        np.save(os.path.join(cdir, "class_ids.npy"), staged.class_ids)
        np.save(os.path.join(cdir, "counts.npy"), staged.counts)
        np.save(os.path.join(cdir, "sizes.npy"), staged.sizes)
        with open(meta_path, "w") as fp:
            json.dump(
                {
                    "sample_ids": list(dataset.sample_ids),
                    "max_objects": int(staged.boxes.shape[1]),
                },
                fp,
            )
    return staged
