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
    """Seed host-side RNG and (optionally) join a multi-host cluster.

    Device-side randomness is explicit jax.random keys derived from
    cfg.seed; there is no global device seed to set. For multi-host TPU
    pods set SQDT_COORDINATOR (+ SQDT_NUM_PROCESSES / SQDT_PROCESS_ID) and
    every host calls `jax.distributed.initialize`; the SPMD train step is
    host-count-agnostic — the mesh just spans all global devices and XLA
    routes the gradient all-reduce over ICI/DCN.
    """
    np.random.seed(cfg.seed)

    import os

    coordinator = os.environ.get("SQDT_COORDINATOR")
    if coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ.get("SQDT_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("SQDT_PROCESS_ID", "0")),
        )


def load_dataset(name: str):
    if name.lower() == "kitti":
        from squeezedet_tpu.data.kitti import KITTI

        return KITTI
    if name.lower() == "coco":
        from squeezedet_tpu.data.coco import COCO

        return COCO
    raise ValueError(f"unknown dataset: {name}")
