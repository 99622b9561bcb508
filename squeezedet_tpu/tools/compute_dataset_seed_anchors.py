#!/usr/bin/env python
"""k-means++ seed anchors from GT box shapes, sorted by area
(reference src/utils/compute_dataset_seed_anchors.py:23-61)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _kmeans_pp(points: np.ndarray, k: int, iters: int = 25, seed: int = 0):
    """Plain k-means with k-means++ init (scipy-free fallback)."""
    rng = np.random.default_rng(seed)
    centers = [points[rng.integers(len(points))]]
    for _ in range(k - 1):
        d2 = np.min(
            ((points[:, None, :] - np.asarray(centers)[None]) ** 2).sum(-1), axis=1
        )
        probs = d2 / d2.sum()
        centers.append(points[rng.choice(len(points), p=probs)])
    centers = np.asarray(centers, dtype=np.float64)
    for _ in range(iters):
        assign = np.argmin(
            ((points[:, None, :] - centers[None]) ** 2).sum(-1), axis=1
        )
        for j in range(k):
            sel = points[assign == j]
            if len(sel):
                centers[j] = sel.mean(axis=0)
    return centers


def compute_seed_anchors(
    dataset, anchors_per_grid: int = 9, max_num_samples: int = 30000,
    num_workers: int = 4, seed: int = 0,
) -> np.ndarray:
    n = min(max_num_samples, len(dataset))
    indices = np.random.default_rng(seed).permutation(len(dataset))[:n]

    def boxes_of(i):
        _, boxes = dataset.load_annotations(int(i))
        return boxes

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        all_boxes = [b for b in pool.map(boxes_of, indices) if len(b)]
    boxes = np.concatenate(all_boxes, axis=0)
    shapes = boxes[:, [2, 3]] - boxes[:, [0, 1]]

    try:
        from scipy.cluster.vq import kmeans2

        seeds = kmeans2(shapes, anchors_per_grid, minit="++", iter=25, seed=seed)[0]
    except Exception:
        seeds = _kmeans_pp(shapes, anchors_per_grid, seed=seed)

    seeds = seeds[np.argsort(seeds[:, 0] * seeds[:, 1])]
    return seeds.astype(np.int32)


def main() -> None:
    import os
    import sys

    from squeezedet_tpu.config import parse
    from squeezedet_tpu.utils.misc import load_dataset

    argv = sys.argv[1:]
    out_path = ""
    if "--out" in argv:  # not a Config flag: strip before parse
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("--out requires a path argument")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    cfg = parse(["eval"] + argv)
    dataset = load_dataset(cfg.dataset)("trainval", cfg)
    seeds = compute_seed_anchors(dataset, num_workers=cfg.num_workers)
    print("Dataset's seed anchors:")
    print(seeds)
    if out_path:
        # float format: '%d' would truncate the k-means centroids toward
        # zero, a systematic sub-pixel shrink baked into every round-trip
        np.savetxt(out_path, seeds, fmt="%.2f")
        print(f"saved to {os.path.abspath(out_path)} "
              "(feed back via --anchor_seeds_file)")


if __name__ == "__main__":
    main()
