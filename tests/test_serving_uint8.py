"""uint8 serving path: raw images + folded whitening must reproduce the
standard float path's detections (up to uint8 resize quantization)."""

import os

import numpy as np
import pytest

from squeezedet_tpu.config import Config
from squeezedet_tpu.engine.detector import Detector
from squeezedet_tpu.models.squeezedet import init_params
from squeezedet_tpu.train import build_task

from tests.test_e2e import TinyKITTI, _make_kitti_tree

import jax


def _cfg(tmp_path, **overrides):
    cfg = Config(mode="eval", batch_size=2, num_workers=2, keep_top_k=16,
                 score_thresh=0.1, **overrides)
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")
    return cfg


def test_uint8_serving_matches_float_path(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))

    cfg_f = _cfg(tmp_path, serve_uint8=False)  # uint8 is the default now
    ds = TinyKITTI("val", cfg_f)
    cfg_f.update_dataset_info(ds)
    task = build_task(cfg_f)
    # scaled-up weights so random-weight scores spread across the threshold
    params = jax.tree.map(
        lambda a: a * 30.0, init_params(jax.random.PRNGKey(0), task.model)
    )

    det_float = Detector(params, task, cfg_f)
    results_float = det_float.detect_dataset(ds)

    cfg_u8 = _cfg(tmp_path, serve_uint8=True)
    ds8 = TinyKITTI("val", cfg_u8)
    cfg_u8.update_dataset_info(ds8)
    det_u8 = Detector(params, task, cfg_u8)
    results_u8 = det_u8.detect_dataset(ds8)

    assert len(results_float) == len(results_u8) == 4
    # Random weights make individual boxes chaotic (clamped corners flip on
    # 1-LSB input changes), so compare the score *distributions* and kept
    # counts rather than box-by-box geometry.
    compared = 0
    for rf, r8 in zip(results_float, results_u8):
        nf = len(rf.get("scores", ()))
        n8 = len(r8.get("scores", ()))
        assert abs(nf - n8) <= 2, (nf, n8)
        n = min(nf, n8)
        if n:
            compared += 1
            sf = np.sort(rf["scores"])[::-1][:n]
            s8 = np.sort(r8["scores"])[::-1][:n]
            np.testing.assert_allclose(sf, s8, atol=0.05)
    assert compared >= 2  # the paths genuinely produced comparable output


def test_raw_inference_item_dtype(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    ds = TinyKITTI("val", _cfg(tmp_path))
    raw = ds.inference_item(0, raw=True)
    assert raw["image"].dtype == np.uint8
    assert "rgb_mean" not in raw["image_meta"]
    std = ds.inference_item(0)
    assert std["image"].dtype == np.float32
    assert "rgb_mean" in std["image_meta"]


def test_tta_flip_detector_smoke(tmp_path):
    """--tta_flip through the real Detector on the uint8 default path:
    runs end-to-end, returns one result per image, boxes in original
    coordinates; int8 + TTA is refused."""
    _make_kitti_tree(str(tmp_path / "data"))

    cfg = _cfg(tmp_path, tta_flip=True)
    ds = TinyKITTI("val", cfg)
    cfg.update_dataset_info(ds)
    task = build_task(cfg)
    params = jax.tree.map(
        lambda a: a * 30.0, init_params(jax.random.PRNGKey(0), task.model)
    )
    det = Detector(params, task, cfg)
    results = det.detect_dataset(ds)
    assert len(results) == 4
    for r in results:
        for b in r.get("boxes", ()):
            assert b[0] <= b[2] and b[1] <= b[3]

    cfg_bad = _cfg(tmp_path, tta_flip=True, serve_int8=True)
    cfg_bad.update_dataset_info(ds)
    with pytest.raises(ValueError, match="tta_flip"):
        Detector(params, task, cfg_bad)
