#!/usr/bin/env python
"""Convert a KITTI-format dataset tree into the COCO layout.

    python tools/kitti_to_coco.py <src_data_dir> <dst_data_dir>

Reads ``<src>/kitti/{image_sets/{train,val}.txt, training/{image_2,
label_2}}`` and writes ``<dst>/coco/annotations/instances_{train,val}.json``
plus ``<dst>/coco/{train,val}/`` image symlinks (copies with --copy).

Class mapping: Car/Pedestrian/Cyclist -> category ids 1/2/3. KITTI
``DontCare`` regions become one ``iscrowd=1`` annotation PER category
(COCO crowd matching is per-category, KITTI DontCare is class-agnostic —
emitting the region under every category makes the evaluator absorb any
class's detections there, mirroring the devkit); other KITTI types (Van,
Truck, ...) are skipped, like the reference trainer does
(src/datasets/kitti.py:49-72).

Image sizes come from the PNG IHDR header directly (no decode) — the
1-core host converts a 4.5k-image set in seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import struct
import sys

CLASS_TO_CAT = {"Car": 1, "Pedestrian": 2, "Cyclist": 3}
CATEGORIES = [
    {"id": 1, "name": "Car"},
    {"id": 2, "name": "Pedestrian"},
    {"id": 3, "name": "Cyclist"},
]


def png_size(path: str) -> tuple[int, int]:
    """(height, width) from the PNG IHDR chunk (bytes 16-24)."""
    with open(path, "rb") as fp:
        head = fp.read(26)
    if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
        raise ValueError(f"not a PNG: {path}")
    w, h = struct.unpack(">II", head[16:24])
    return h, w


def convert_split(src_kitti: str, dst_coco: str, split: str,
                  copy_images: bool = False) -> int:
    ids_path = os.path.join(src_kitti, "image_sets", f"{split}.txt")
    with open(ids_path) as fp:
        sample_ids = [line.strip() for line in fp if line.strip()]

    img_dir = os.path.join(dst_coco, split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i, sid in enumerate(sample_ids, start=1):
        src_img = os.path.join(src_kitti, "training/image_2", sid + ".png")
        h, w = png_size(src_img)
        file_name = sid + ".png"
        dst_img = os.path.join(img_dir, file_name)
        if not os.path.exists(dst_img):
            if copy_images:
                shutil.copyfile(src_img, dst_img)
            else:
                os.symlink(os.path.abspath(src_img), dst_img)
        images.append(
            {"id": i, "file_name": file_name, "width": w, "height": h}
        )

        label_path = os.path.join(src_kitti, "training/label_2", sid + ".txt")
        with open(label_path) as fp:
            for line in fp:
                fields = line.split()
                if not fields:
                    continue
                name = fields[0]
                crowd = 1 if name == "DontCare" else 0
                if name not in CLASS_TO_CAT and not crowd:
                    continue
                x1, y1, x2, y2 = (float(v) for v in fields[4:8])
                bw, bh = max(0.0, x2 - x1), max(0.0, y2 - y1)
                if bw <= 0 or bh <= 0:
                    continue
                cats = (
                    [c["id"] for c in CATEGORIES]  # class-agnostic DontCare
                    if crowd
                    else [CLASS_TO_CAT[name]]
                )
                for cat in cats:
                    annotations.append(
                        {
                            "id": ann_id,
                            "image_id": i,
                            "category_id": cat,
                            "bbox": [x1, y1, bw, bh],
                            "area": bw * bh,
                            "iscrowd": crowd,
                        }
                    )
                    ann_id += 1

    os.makedirs(os.path.join(dst_coco, "annotations"), exist_ok=True)
    out = os.path.join(dst_coco, "annotations", f"instances_{split}.json")
    with open(out, "w") as fp:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": CATEGORIES,
            },
            fp,
        )
    print(f"{split}: {len(images)} images, {len(annotations)} annotations -> {out}")
    return len(images)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src", help="source data dir containing kitti/")
    parser.add_argument("dst", help="destination data dir for coco/")
    parser.add_argument(
        "--copy", action="store_true", help="copy images instead of symlinking"
    )
    args = parser.parse_args(argv)

    src_kitti = os.path.join(args.src, "kitti")
    dst_coco = os.path.join(args.dst, "coco")
    total = 0
    for split in ("train", "val"):
        if os.path.exists(
            os.path.join(src_kitti, "image_sets", f"{split}.txt")
        ):
            total += convert_split(src_kitti, dst_coco, split, args.copy)
    if not total:
        print("no splits found", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
