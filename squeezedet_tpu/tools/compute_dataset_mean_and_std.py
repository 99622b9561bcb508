#!/usr/bin/env python
"""Per-channel RGB mean/std over (a sample of) a dataset
(reference src/utils/compute_dataset_mean_and_std.py:22-58): the mean of
per-image channel means and the mean of per-image channel stds."""

from __future__ import annotations

import argparse
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def compute_mean_and_std(
    dataset, max_num_samples: int = 30000, num_workers: int = 4, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    n = min(max_num_samples, len(dataset))
    indices = np.random.default_rng(seed).permutation(len(dataset))[:n]

    def stats(i):
        image, _ = dataset.load_image(int(i))
        return image.mean(axis=(0, 1)), image.std(axis=(0, 1))

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        results = list(pool.map(stats, indices))

    means = np.stack([m for m, _ in results])
    stds = np.stack([s for _, s in results])
    return means.mean(axis=0), stds.mean(axis=0)


def main() -> None:
    from squeezedet_tpu.config import parse
    from squeezedet_tpu.utils.misc import load_dataset

    parser_args = ["eval"]
    import sys

    cfg = parse(parser_args + sys.argv[1:])
    dataset = load_dataset(cfg.dataset)("trainval", cfg)
    mean, std = compute_mean_and_std(dataset, num_workers=cfg.num_workers)
    print("Dataset's RGB mean:", mean)
    print("Dataset's RGB std:", std)


if __name__ == "__main__":
    main()
