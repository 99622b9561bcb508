"""Small shared utilities: metric averaging, env init, dataset registry."""

from __future__ import annotations

import numpy as np

EPSILON = 1e-10


class MetricLogger:
    """Running value/sum/count/average tracker (per-iteration metrics)."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    @property
    def avg(self) -> float:
        return self.sum / (self.count + EPSILON)

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n


def init_env(cfg) -> None:
    """Seed host-side RNG. Device-side randomness is explicit jax.random
    keys derived from cfg.seed; there is no global device seed to set."""
    np.random.seed(cfg.seed)


def load_dataset(name: str):
    if name.lower() == "kitti":
        from squeezedet_tpu.data.kitti import KITTI

        return KITTI
    if name.lower() == "coco":
        from squeezedet_tpu.data.coco import COCO

        return COCO
    raise ValueError(f"unknown dataset: {name}")
