"""uint8 fast-pipeline: raw host aug + on-device whitening must track the
standard float pipeline within quantization noise, and train end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezedet_tpu.config import Config
from squeezedet_tpu.parallel.train import make_val_step

from tests.test_e2e import TinyKITTI, _make_kitti_tree


def _cfg(tmp_path, **overrides):
    kwargs = dict(mode="train", batch_size=2, num_workers=2, drift_prob=0.0,
                  flip_prob=0.0)
    kwargs.update(overrides)
    cfg = Config(**kwargs)
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")
    return cfg


def test_fast_item_dtype_and_gt_equal(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    ds_std = TinyKITTI("train", _cfg(tmp_path))
    ds_fast = TinyKITTI("train", _cfg(tmp_path, fast_pipeline=True))

    std = ds_std[0]
    fast = ds_fast[0]
    assert std["image"].dtype == np.float32
    assert fast["image"].dtype == np.uint8
    # GT encoding is identical (box math never touches pixel values)
    np.testing.assert_array_equal(std["gt"], fast["gt"])
    # pixels agree after manual whitening (uint8 resize rounds: ±1 LSB)
    manual = (fast["image"].astype(np.float32) - ds_std.rgb_mean) / ds_std.rgb_std
    np.testing.assert_allclose(manual, std["image"], atol=1.2 / 78.0 * 82)


def test_val_loss_close_between_pipelines(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path)
    ds_std = TinyKITTI("val", cfg)
    cfg.update_dataset_info(ds_std)
    from squeezedet_tpu.train import build_task
    from squeezedet_tpu.models.squeezedet import init_params

    task = build_task(cfg)
    params = init_params(jax.random.PRNGKey(0), task.model)
    val = make_val_step(task)
    anchors = jnp.asarray(ds_std.anchors)

    std = ds_std[0]
    ds_fast = TinyKITTI("val", _cfg(tmp_path, fast_pipeline=True))
    fast = ds_fast[0]

    rgb_stats = jnp.stack(
        [
            jnp.asarray(np.ravel(ds_std.rgb_mean), jnp.float32),
            jnp.asarray(np.ravel(ds_std.rgb_std), jnp.float32),
        ]
    )
    s_std = val(params, jnp.asarray(std["image"][None]),
                jnp.asarray(std["gt"][None]), anchors)
    s_fast = val(params, jnp.asarray(fast["image"][None]),
                 jnp.asarray(fast["gt"][None]), anchors, rgb_stats)
    assert float(s_fast["loss"]) == pytest.approx(float(s_std["loss"]), rel=0.02)


def test_fast_pipeline_trains_end_to_end(tmp_path, monkeypatch):
    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _cfg(
        tmp_path, fast_pipeline=True, num_epochs=1, no_eval=True,
        val_intervals=1, drift_prob=0.5, flip_prob=0.5,
    )
    import squeezedet_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "load_dataset", lambda name: TinyKITTI)
    train_mod.train(cfg)
    import os

    assert os.path.isdir(os.path.join(cfg.save_dir, "model_last"))


def test_uint8_without_stats_raises():
    from squeezedet_tpu.parallel.train import _whiten_on_device

    with pytest.raises(ValueError):
        _whiten_on_device(jnp.zeros((1, 4, 4, 3), jnp.uint8), None)
