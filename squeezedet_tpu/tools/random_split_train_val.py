#!/usr/bin/env python
"""Split a KITTI ``trainval.txt`` into seeded half/half train/val lists
(reference src/utils/random_split_train_val.py:5-35)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def split(image_set_dir: str, seed: int = 42) -> tuple[str, str]:
    with open(os.path.join(image_set_dir, "trainval.txt")) as fp:
        ids = [line.strip() for line in fp if line.strip()]

    rng = np.random.RandomState(seed)
    ids = rng.permutation(ids)
    half = len(ids) // 2
    train_ids, val_ids = sorted(ids[:half]), sorted(ids[half:])

    train_file = os.path.join(image_set_dir, "train.txt")
    val_file = os.path.join(image_set_dir, "val.txt")
    with open(train_file, "w") as fp:
        fp.writelines(f"{i}\n" for i in train_ids)
    with open(val_file, "w") as fp:
        fp.writelines(f"{i}\n" for i in val_ids)
    return train_file, val_file


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--image_set_dir", default="data/kitti/image_sets",
        help="directory containing trainval.txt",
    )
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()
    train_file, val_file = split(args.image_set_dir, args.seed)
    print("Training set saved to", train_file)
    print("Validation set saved to", val_file)


if __name__ == "__main__":
    main()
