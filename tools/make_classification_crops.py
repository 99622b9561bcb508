#!/usr/bin/env python
"""Build a classification dataset (object crops + background) from a
KITTI-format detection dataset.

Purpose: feed the backbone pretraining pipeline (``main.py pretrain``,
squeezedet_tpu/pretrain.py) — the in-framework stand-in for the ImageNet
stage of the reference's workflow (its README step 1 downloads torchvision
squeezenet1_1 ImageNet weights; unobtainable here, zero egress). Crops of
labeled objects become class samples; random low-overlap windows become a
``Background`` class so the pretrained features also learn "nothing here".

Output layout (<out_dir>/):
    images_train.npy  (N, S, S, 3) uint8
    labels_train.npy  (N,) int16
    images_val.npy / labels_val.npy
    meta.json         {classes, crop_size, rgb_mean, rgb_std, context}

Usage:
    python tools/make_classification_crops.py data_synth data_cls \
        --crop_size 96 --context 1.25 --bg_per_image 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squeezedet_tpu.core.image import _resize_image  # noqa: E402
from squeezedet_tpu.data.imageio import read_image  # noqa: E402

KITTI_CLASSES = ("Car", "Pedestrian", "Cyclist")


def _read_labels(path: str) -> tuple[list[str], np.ndarray]:
    names, boxes = [], []
    with open(path) as fp:
        for line in fp:
            fields = line.strip().split(" ")
            if not fields or len(fields) < 8:
                continue
            names.append(fields[0])
            boxes.append([float(v) for v in fields[4:8]])
    return names, np.array(boxes, np.float32).reshape(-1, 4)


def _expand_clip(box, factor, w, h):
    x1, y1, x2, y2 = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    half_w, half_h = (x2 - x1 + 1) * factor / 2, (y2 - y1 + 1) * factor / 2
    # keep the crop square-ish: pad the short side toward the long one so
    # the resize to S x S distorts less
    half = max(half_w, half_h)
    x1, x2 = cx - half, cx + half
    y1, y2 = cy - half, cy + half
    return (
        int(max(0, np.floor(x1))),
        int(max(0, np.floor(y1))),
        int(min(w, np.ceil(x2))),
        int(min(h, np.ceil(y2))),
    )


def _iou_one_to_many(box, boxes):
    if len(boxes) == 0:
        return np.zeros((0,), np.float32)
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(0, x2 - x1 + 1) * np.maximum(0, y2 - y1 + 1)
    a = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    return inter / np.maximum(a + b - inter, 1e-9)


def build_split(data_dir, ids, crop_size, context, bg_per_image, min_px, rng):
    classes = list(KITTI_CLASSES) + ["Background"]
    bg_label = len(KITTI_CLASSES)
    images, labels = [], []
    for image_id in ids:
        img = read_image(
            os.path.join(data_dir, "training/image_2", image_id + ".png")
        ).astype(np.uint8)
        h, w = img.shape[:2]
        names, boxes = _read_labels(
            os.path.join(data_dir, "training/label_2", image_id + ".txt")
        )
        keep_boxes = []
        for name, box in zip(names, boxes):
            keep_boxes.append(box)  # avoid bg overlapping ANY labeled region
            if name not in KITTI_CLASSES:
                continue
            if (box[2] - box[0]) < min_px or (box[3] - box[1]) < min_px:
                continue
            x1, y1, x2, y2 = _expand_clip(box, context, w, h)
            if x2 - x1 < 4 or y2 - y1 < 4:
                continue
            crop = _resize_image(img[y1:y2, x1:x2], (crop_size, crop_size))
            images.append(crop.astype(np.uint8))
            labels.append(classes.index(name))
        keep_boxes = np.array(keep_boxes, np.float32).reshape(-1, 4)
        # background windows: random square crops with low overlap to every
        # labeled box (including DontCare clutter regions)
        tries, made = 0, 0
        while made < bg_per_image and tries < 20 * bg_per_image:
            tries += 1
            size = int(rng.integers(24, max(25, min(h, w) // 2)))
            x1 = int(rng.integers(0, max(1, w - size)))
            y1 = int(rng.integers(0, max(1, h - size)))
            box = np.array([x1, y1, x1 + size, y1 + size], np.float32)
            if np.any(_iou_one_to_many(box, keep_boxes) > 0.1):
                continue
            crop = _resize_image(
                img[y1 : y1 + size, x1 : x1 + size], (crop_size, crop_size)
            )
            images.append(crop.astype(np.uint8))
            labels.append(bg_label)
            made += 1
    return (
        np.stack(images) if images else np.zeros((0, crop_size, crop_size, 3), np.uint8),
        np.array(labels, np.int16),
        classes,
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("data_dir", help="KITTI-format root (contains kitti/)")
    ap.add_argument("out_dir")
    ap.add_argument("--crop_size", type=int, default=96)
    ap.add_argument("--context", type=float, default=1.25,
                    help="box expansion factor before cropping")
    ap.add_argument("--bg_per_image", type=int, default=2)
    ap.add_argument("--min_px", type=float, default=12.0,
                    help="skip objects smaller than this on either side")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    kitti_dir = os.path.join(args.data_dir, "kitti")
    if not os.path.isdir(kitti_dir):
        kitti_dir = args.data_dir
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    meta = {"crop_size": args.crop_size, "context": args.context}
    for split in ("train", "val"):
        with open(os.path.join(kitti_dir, "image_sets", split + ".txt")) as fp:
            ids = [line.strip() for line in fp if line.strip()]
        images, labels, classes = build_split(
            kitti_dir, ids, args.crop_size, args.context,
            args.bg_per_image, args.min_px, rng,
        )
        np.save(os.path.join(args.out_dir, f"images_{split}.npy"), images)
        np.save(os.path.join(args.out_dir, f"labels_{split}.npy"), labels)
        meta["classes"] = classes
        if split == "train":
            f32 = images.astype(np.float32)
            meta["rgb_mean"] = [float(v) for v in f32.mean(axis=(0, 1, 2))]
            meta["rgb_std"] = [float(v) for v in f32.std(axis=(0, 1, 2))]
        counts = {c: int((labels == i).sum()) for i, c in enumerate(classes)}
        print(f"[{split}] {len(labels)} crops: {counts}")
    with open(os.path.join(args.out_dir, "meta.json"), "w") as fp:
        json.dump(meta, fp, indent=1)
    print("wrote", args.out_dir)


if __name__ == "__main__":
    main()
