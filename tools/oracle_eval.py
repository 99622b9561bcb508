#!/usr/bin/env python
"""Measure the evaluation-protocol ceiling: score ground truth as detections.

Writes, for every image in a split, a devkit-format result file containing
exactly the labeled boxes (score 1.0), then runs the same evaluator the
training loop uses. The resulting APs are the *protocol* ceiling — anything
below 1.0 is imposed by the eval pipeline (min-height gates, ignore
regions, 41-pt interpolation), not by any model. The gap between a trained
model's APs and these numbers is genuine model headroom.

Motivation: committed runs plateau at hard-difficulty APs ~0.905
(EVIDENCE.md, hard300 / plus_ft300). This tool decides whether that 0.905
is a data/protocol ceiling or model shortfall. No reference counterpart
(the reference never separates protocol ceiling from model error).

Host-only (numpy + the evaluator); no TPU needed.

Usage: python tools/oracle_eval.py [--data_dir data_synth] [--split val]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from squeezedet_tpu.utils.kitti_eval import run_kitti_eval

CLASS_NAMES = ("Car", "Pedestrian", "Cyclist")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data_synth")
    ap.add_argument("--split", default="val", choices=("train", "val", "trainval"))
    ap.add_argument(
        "--out_dir",
        default=None,
        help="results dir (default <data_dir>/kitti/oracle_<split>)",
    )
    args = ap.parse_args()

    kitti_dir = os.path.join(args.data_dir, "kitti")
    set_path = os.path.join(kitti_dir, "image_sets", args.split + ".txt")
    with open(set_path) as fp:
        ids = [line.strip() for line in fp if line.strip()]

    out_dir = args.out_dir or os.path.join(kitti_dir, f"oracle_{args.split}")
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    wanted = {n.lower() for n in CLASS_NAMES}
    n_boxes = 0
    for image_id in ids:
        label_path = os.path.join(kitti_dir, "training/label_2", image_id + ".txt")
        lines_out = []
        with open(label_path) as fp:
            for line in fp:
                f = line.split()
                if not f or f[0].lower() not in wanted:
                    continue
                x1, y1, x2, y2 = (float(v) for v in f[4:8])
                lines_out.append(
                    f"{f[0].lower()} -1 -1 0 {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}"
                    f" 0 0 0 0 0 0 0 1.000\n"
                )
        n_boxes += len(lines_out)
        with open(os.path.join(data_dir, image_id + ".txt"), "w") as fp:
            fp.writelines(lines_out)

    print(f"oracle detections written: {len(ids)} images, {n_boxes} boxes")
    run_kitti_eval(
        gt_dir=os.path.join(kitti_dir, "training"),
        image_set_path=set_path,
        results_dir=out_dir,
        num_images=len(ids),
    )

    total, count = 0.0, 0
    for class_name in CLASS_NAMES:
        stats_path = os.path.join(out_dir, f"stats_{class_name.lower()}_ap.txt")
        with open(stats_path) as fp:
            values = [float(line.split("=")[1]) for line in fp][:3]
        for difficulty, v in zip(("easy", "moderate", "hard"), values):
            print(f"oracle {class_name}_{difficulty}: {v:.4f}")
            total += v
            count += 1
    print(f"oracle mAP: {total / count:.4f}")


if __name__ == "__main__":
    main()
