#!/usr/bin/env python
"""Attribute a trained model's residual misses to ground-truth properties.

tools/oracle_eval.py establishes the eval protocol imposes no ceiling
(oracle mAP = 1.0), so a hard-AP plateau is model shortfall. This tool
says *where*: for every ground-truth box in a split it finds the best
IoU-eligible detection from a completed eval's result files (the devkit
matching rule: class-wise, IoU 0.7 car / 0.5 ped+cyc) and reports recall
broken down by devkit difficulty, pixel height, occlusion level, and
truncation — plus the score distribution of the matches, which separates
"never detected" from "detected but scored too low".

No reference counterpart; pure host-side numpy over txt files.

Usage:
  python tools/analyze_misses.py exp/plus_ft300/results/data \
      [--data_dir data_synth] [--split val] [--score_thresh 0.3]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np

CLASSES = ("car", "pedestrian", "cyclist")
MIN_IOU = {"car": 0.7, "pedestrian": 0.5, "cyclist": 0.5}
# devkit gates: (max truncation, max occlusion, min pixel height)
DIFFICULTY = {
    "easy": (0.15, 0, 40.0),
    "moderate": (0.30, 1, 25.0),
    "hard": (0.50, 2, 25.0),
}
HEIGHT_BINS = ((0, 25), (25, 30), (30, 40), (40, 60), (60, 100), (100, 10_000))


def iou_1many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Devkit IoU (exclusive area, no +1) of one box vs many."""
    if boxes.size == 0:
        return np.zeros((0,), dtype=np.float64)
    ix = np.minimum(box[2], boxes[:, 2]) - np.maximum(box[0], boxes[:, 0])
    iy = np.minimum(box[3], boxes[:, 3]) - np.maximum(box[1], boxes[:, 1])
    inter = np.clip(ix, 0, None) * np.clip(iy, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-9)


def read_gt(path: str):
    rows = []
    with open(path) as fp:
        for line in fp:
            f = line.split()
            if not f or f[0].lower() not in CLASSES:
                continue
            rows.append(
                (
                    f[0].lower(),
                    float(f[1]),  # truncation
                    int(float(f[2])),  # occlusion
                    np.array([float(v) for v in f[4:8]]),
                )
            )
    return rows


def read_dets(path: str):
    by_class: dict[str, list] = defaultdict(list)
    if not os.path.exists(path):
        return {}
    with open(path) as fp:
        for line in fp:
            f = line.split()
            if not f or f[0].lower() not in CLASSES:
                continue
            by_class[f[0].lower()].append(
                [float(f[4]), float(f[5]), float(f[6]), float(f[7]), float(f[15])]
            )
    return {k: np.array(v) for k, v in by_class.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("results_data_dir", help="dir of per-image detection txts")
    ap.add_argument("--data_dir", default="data_synth")
    ap.add_argument("--split", default="val")
    ap.add_argument(
        "--score_thresh",
        type=float,
        default=0.3,
        help="operating point for the 'recall@thresh' column",
    )
    args = ap.parse_args()

    kitti_dir = os.path.join(args.data_dir, "kitti")
    with open(os.path.join(kitti_dir, "image_sets", args.split + ".txt")) as fp:
        ids = [line.strip() for line in fp if line.strip()]

    # per-GT record: (class, trunc, occ, height, best matched score or -1,
    #                 best IoU at any score, w/h aspect)
    records = []
    for image_id in ids:
        gt = read_gt(os.path.join(kitti_dir, "training/label_2", image_id + ".txt"))
        dets = read_dets(os.path.join(args.results_data_dir, image_id + ".txt"))
        for cls, trunc, occ, box in gt:
            d = dets.get(cls)
            score, best_iou = -1.0, 0.0
            if d is not None and d.size:
                ious = iou_1many(box, d[:, :4])
                best_iou = float(ious.max())
                ok = ious >= MIN_IOU[cls]
                if ok.any():
                    score = float(d[ok, 4].max())
            records.append(
                (cls, trunc, occ, box[3] - box[1], score, best_iou,
                 (box[2] - box[0]) / max(box[3] - box[1], 1e-9))
            )

    def report(rows, label):
        n = len(rows)
        if n == 0:
            print(f"  {label:<18} n=0")
            return
        scores = np.array([r[4] for r in rows])
        any_rec = float((scores >= 0).mean())
        thr_rec = float((scores >= args.score_thresh).mean())
        print(
            f"  {label:<18} n={n:<5d} recall@any {any_rec:.3f}"
            f"  recall@{args.score_thresh:g} {thr_rec:.3f}"
        )

    print(f"{len(records)} GT boxes over {len(ids)} images")
    for cls in CLASSES:
        rows_c = [r for r in records if r[0] == cls]
        print(f"\n== {cls} (IoU {MIN_IOU[cls]}) ==")
        for diff, (max_t, max_o, min_h) in DIFFICULTY.items():
            report(
                [r for r in rows_c if r[1] <= max_t and r[2] <= max_o and r[3] >= min_h],
                diff,
            )
        print("  -- by height (hard-eligible only) --")
        hard_t, hard_o, hard_h = DIFFICULTY["hard"]
        rows_h = [
            r for r in rows_c if r[1] <= hard_t and r[2] <= hard_o and r[3] >= hard_h
        ]
        for lo, hi in HEIGHT_BINS:
            if hi <= hard_h:
                continue
            report([r for r in rows_h if lo <= r[3] < hi], f"h[{lo},{hi})")
        print("  -- by occlusion (hard-eligible only) --")
        for occ in (0, 1, 2):
            report([r for r in rows_h if r[2] == occ], f"occ={occ}")
        print("  -- by truncation (hard-eligible only) --")
        for lo, hi in ((0.0, 0.15), (0.15, 0.30), (0.30, 0.50)):
            report([r for r in rows_h if lo <= r[1] <= hi], f"trunc[{lo},{hi}]")
        # best-IoU histogram of the MISSES: separates "never detected"
        # (best-IoU < 0.3) from "detected but mislocalized" (best-IoU in
        # [0.5, gate)) — the round-4 Car_hard diagnosis showed the latter
        # dominates (amodal under-regression on occluded boxes)
        missed = [r for r in rows_h if r[4] < 0]
        if missed:
            print(f"  -- misses by best-IoU at any score (n={len(missed)}) --")
            edges = [
                e for e in (0.0, 0.1, 0.3, 0.5, 0.6) if e < MIN_IOU[cls]
            ] + [MIN_IOU[cls]]
            for lo, hi in zip(edges[:-1], edges[1:]):
                n = sum(1 for r in missed if lo <= r[5] < hi)
                print(f"  iou[{lo:g},{hi:g})     n={n}")
            asp = sorted(r[6] for r in missed)
            print(
                f"  missed aspect w/h: median {asp[len(asp) // 2]:.2f} "
                f"(population median "
                f"{sorted(r[6] for r in rows_h)[len(rows_h) // 2]:.2f})"
            )


if __name__ == "__main__":
    main()
