"""Eval driver: run the detector over a dataset and score with the native
KITTI evaluator (reference src/eval.py:11-33)."""

from __future__ import annotations

import jax

from squeezedet_tpu.engine.detector import Detector
from squeezedet_tpu.models.squeezedet import init_params
from squeezedet_tpu.utils.checkpoint import load_any
from squeezedet_tpu.utils.misc import load_dataset


def eval_dataset(dataset, params, cfg, task=None):
    """Detect the whole dataset, write KITTI result txts, return APs."""
    from squeezedet_tpu.train import build_task

    task = task or build_task(cfg)
    detector = Detector(params, task, cfg)
    results = detector.detect_dataset(dataset)
    dataset.save_results(results)
    return dataset.evaluate()


def evaluate(cfg) -> dict[str, float]:
    from squeezedet_tpu.train import build_task

    if not cfg.load_model and not getattr(cfg, "allow_random_weights", False):
        raise SystemExit(
            "eval: no --load_model given — this would score freshly "
            "initialized random weights and report a plausible-looking "
            "mAP~0. Pass --load_model <ckpt> or --allow_random_weights "
            "to proceed anyway."
        )

    dataset = load_dataset(cfg.dataset)("val", cfg)
    cfg.update_dataset_info(dataset)
    print(cfg.describe())

    task = build_task(cfg)
    params = init_params(jax.random.PRNGKey(cfg.seed), task.model)
    if cfg.load_model:
        params, _ = load_any(cfg.load_model, params, task.model)

    aps = eval_dataset(dataset, params, cfg, task)
    for k, v in aps.items():
        print(f"{k:<20} {v:.3f}")
    return aps
