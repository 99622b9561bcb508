"""Trainer failure detection: a diverging run must fail loudly."""

import numpy as np
import pytest

from squeezedet_tpu.config import Config
from squeezedet_tpu.data.loader import DataLoader
from squeezedet_tpu.engine.trainer import Trainer
from squeezedet_tpu.models.squeezedet import init_params

from tests.test_e2e import TinyKITTI, _make_kitti_tree

import jax


def test_nan_guard_raises(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    cfg = Config(
        mode="train", batch_size=2, num_workers=2,
        lr=1e12,  # guaranteed divergence within a few steps
        grad_norm=1e30,  # disable the clip so the explosion goes through
        num_epochs=3, drift_prob=0.0, flip_prob=0.0,
    )
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")

    ds = TinyKITTI("train", cfg)
    cfg.update_dataset_info(ds)
    from squeezedet_tpu.train import build_task

    task = build_task(cfg)
    trainer = Trainer(init_params(jax.random.PRNGKey(0), task.model), task, cfg)
    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)

    with pytest.raises(FloatingPointError, match="non-finite loss"):
        for epoch in range(1, 4):
            trainer.train_epoch(epoch, loader)


def test_eval_refuses_random_weights():
    """eval with no --load_model must refuse loudly instead of scoring
    fresh random weights as a plausible-looking mAP~0 run."""
    from squeezedet_tpu.eval import evaluate

    cfg = Config(mode="eval", load_model="")
    with pytest.raises(SystemExit, match="load_model"):
        evaluate(cfg)
