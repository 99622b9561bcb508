"""Backbone pretraining: classifier model, torchvision-format export, the
.pth round-trip into detection fine-tuning, and the pretrain driver
end-to-end on the CPU mesh.

The trunk must be byte-compatible with torchvision squeezenet1_1's state
dict (reference src/utils/model.py:43-61 consumes exactly that file), so
these tests pin the key names, Sequential indices, and OIHW shapes."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import Config
from squeezedet_tpu.models.classifier import (
    ClassifierSpec,
    export_torchvision_pth,
    forward_classifier,
    init_classifier_params,
)
from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
from squeezedet_tpu.utils.checkpoint import load_pth_params

SPEC = ClassifierSpec(num_classes=4)


def test_forward_shapes_and_finite():
    params = init_classifier_params(jax.random.PRNGKey(0), SPEC)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    logits = forward_classifier(params, x, SPEC)
    assert logits.shape == (2, 4)
    assert logits.dtype == jnp.float32
    assert np.all(np.isfinite(logits))
    # training mode needs a dropout rng
    with pytest.raises(ValueError):
        forward_classifier(params, x, SPEC, training=True)


def test_trunk_channels():
    assert SPEC.trunk_channels == 512  # squeezenet1_1 feature width
    with pytest.raises(ValueError):
        _ = ClassifierSpec(num_fires=99).trunk_channels


def test_plus_arch_full_trunk():
    """squeezedetplus pretrains its whole 10-fire trunk (its ImageNet
    backbone covers every fire) and round-trips into the plus detector."""
    spec = ClassifierSpec(arch="squeezedetplus", num_classes=4, num_fires=10)
    assert spec.trunk_channels == 512
    params = init_classifier_params(jax.random.PRNGKey(0), spec)
    logits = forward_classifier(
        params, jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)), spec
    )
    assert logits.shape == (1, 4)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "plus.pth")
        export_torchvision_pth(params, spec, path)
        det_spec = ModelSpec(arch="squeezedetplus", init_scheme="he")
        init = init_params(jax.random.PRNGKey(7), det_spec)
        loaded, _ = load_pth_params(path, init, det_spec, verbose=False)
        for i in range(10):
            np.testing.assert_allclose(
                loaded[f"fire{i}"]["squeeze"]["w"],
                params[f"fire{i}"]["squeeze"]["w"],
            )
        np.testing.assert_array_equal(
            loaded["convdet"]["w"], init["convdet"]["w"]
        )


def test_export_matches_torchvision_squeezenet11_layout(tmp_path):
    """Exported keys/shapes must be exactly the official squeezenet1_1
    state-dict layout (features Sequential indices 0,3,4,6,7,9,10,11,12)."""
    import torch

    params = init_classifier_params(jax.random.PRNGKey(0), SPEC)
    path = str(tmp_path / "backbone.pth")
    export_torchvision_pth(params, SPEC, path)
    sd = torch.load(path, map_location="cpu", weights_only=True)

    fire_idx = [3, 4, 6, 7, 9, 10, 11, 12]
    expected = {"features.0.weight", "features.0.bias",
                "classifier.1.weight", "classifier.1.bias"}
    for i in fire_idx:
        for part in ("squeeze", "expand1x1", "expand3x3"):
            expected.add(f"features.{i}.{part}.weight")
            expected.add(f"features.{i}.{part}.bias")
    assert set(sd.keys()) == expected
    assert tuple(sd["features.0.weight"].shape) == (64, 3, 3, 3)  # OIHW
    assert tuple(sd["features.3.squeeze.weight"].shape) == (16, 64, 1, 1)
    assert tuple(sd["features.12.expand3x3.weight"].shape) == (256, 64, 3, 3)
    assert tuple(sd["classifier.1.weight"].shape) == (4, 512, 1, 1)


def test_pth_roundtrip_into_detection(tmp_path):
    """Export from the classifier, load through the REAL ImageNet-checkpoint
    path into the detection model: stem+fire0..7 transfer exactly, the
    detection-only fires and ConvDet head keep their fresh init."""
    cls_params = init_classifier_params(jax.random.PRNGKey(0), SPEC)
    path = str(tmp_path / "backbone.pth")
    export_torchvision_pth(cls_params, SPEC, path)

    det_spec = ModelSpec(init_scheme="he")
    init = init_params(jax.random.PRNGKey(7), det_spec)
    loaded, epoch = load_pth_params(path, init, det_spec, verbose=False)
    assert epoch == 0

    np.testing.assert_allclose(loaded["stem"]["w"], cls_params["stem"]["w"])
    for i in range(8):
        for part in ("squeeze", "expand1", "expand3"):
            np.testing.assert_allclose(
                loaded[f"fire{i}"][part]["w"], cls_params[f"fire{i}"][part]["w"]
            )
            np.testing.assert_allclose(
                loaded[f"fire{i}"][part]["b"], cls_params[f"fire{i}"][part]["b"]
            )
    for name in ("fire8", "fire9"):
        np.testing.assert_array_equal(
            loaded[name]["squeeze"]["w"], init[name]["squeeze"]["w"]
        )
    np.testing.assert_array_equal(loaded["convdet"]["w"], init["convdet"]["w"])


def _write_crop_dataset(root, n_train=256, n_val=64, size=48, n_classes=3):
    """Trivially separable color-blob crops: class c is dominated by
    channel c."""
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    f32 = None
    for split, n in (("train", n_train), ("val", n_val)):
        labels = rng.integers(0, n_classes, n).astype(np.int16)
        images = rng.integers(0, 60, (n, size, size, 3)).astype(np.uint8)
        for i, c in enumerate(labels):
            images[i, :, :, c] = rng.integers(180, 255, (size, size))
        np.save(os.path.join(root, f"images_{split}.npy"), images)
        np.save(os.path.join(root, f"labels_{split}.npy"), labels)
        if f32 is None:
            f32 = images.astype(np.float32)  # train-split stats
    meta = {
        "classes": [f"c{i}" for i in range(n_classes)],
        "crop_size": size,
        "rgb_mean": [float(v) for v in f32.mean(axis=(0, 1, 2))],
        "rgb_std": [float(v) for v in f32.std(axis=(0, 1, 2))],
    }
    with open(os.path.join(root, "meta.json"), "w") as fp:
        json.dump(meta, fp)


def test_pretrain_driver_e2e(tmp_path):
    """The full pretrain driver on the 8-device CPU mesh: learns a separable
    task, exports a loadable torchvision-format backbone. Runs with
    --ema_decay on so the epoch scan carries the shadow and val/export
    score the averaged weights (the ramped decay keeps the early EMA close
    to the live params, so the accuracy assertion is unaffected), and
    --erase_prob on so the scan carries the random-erasing fill (val is
    un-erased, so the toy task stays separable)."""
    from squeezedet_tpu.pretrain import pretrain

    data_dir = str(tmp_path / "crops")
    _write_crop_dataset(data_dir)
    cfg = Config(
        mode="pretrain", exp_id="pretrain_test", data_dir=data_dir,
        lr=0.01, num_epochs=6, batch_size=16, val_intervals=3,
        save_intervals=6, dropout_prob=0.0, seed=3, ema_decay=0.9,
        erase_prob=0.5,
    )
    cfg.finalize_dirs(root_dir=str(tmp_path))
    pretrain(cfg)

    pth = os.path.join(cfg.save_dir, "backbone_last.pth")
    assert os.path.exists(pth)
    assert os.path.exists(os.path.join(cfg.save_dir, "backbone_best.pth"))

    # learned the toy task: last-epoch train acc well above chance
    log_dirs = [d for d in os.listdir(cfg.save_dir) if d.startswith("logs_")]
    log = open(
        os.path.join(cfg.save_dir, sorted(log_dirs)[-1], "log.txt")
    ).read()
    val_accs = [
        float(line.split("| acc ")[1].split(" ")[0].strip())
        for line in log.splitlines()
        if " val " in line and "| acc " in line
    ]
    assert val_accs and val_accs[-1] > 0.8, log

    # the export loads into detection fine-tuning (3-class head)
    det_spec = ModelSpec(init_scheme="he")
    init = init_params(jax.random.PRNGKey(0), det_spec)
    loaded, _ = load_pth_params(pth, init, det_spec, verbose=False)
    assert not np.allclose(loaded["stem"]["w"], init["stem"]["w"])


def test_make_classification_crops_tool(tmp_path):
    """The crops tool on a tiny KITTI tree: object + background crops with
    sane labels, stats, and meta."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_classification_crops as mcc

    from tests.test_e2e import _make_kitti_tree

    data_root = str(tmp_path / "data")
    _make_kitti_tree(data_root)
    out = str(tmp_path / "crops")
    mcc.main([data_root, out, "--crop_size", "32", "--bg_per_image", "1"])

    images = np.load(os.path.join(out, "images_train.npy"))
    labels = np.load(os.path.join(out, "labels_train.npy"))
    with open(os.path.join(out, "meta.json")) as fp:
        meta = json.load(fp)
    assert meta["classes"] == ["Car", "Pedestrian", "Cyclist", "Background"]
    assert images.dtype == np.uint8 and images.shape[1:] == (32, 32, 3)
    assert len(images) == len(labels) > 0
    # every tree image has a Car and a Pedestrian label; backgrounds made
    assert (labels == 0).sum() > 0 and (labels == 1).sum() > 0
    assert (labels == 3).sum() > 0
    assert len(meta["rgb_mean"]) == 3 and all(s > 0 for s in meta["rgb_std"])
    assert os.path.exists(os.path.join(out, "images_val.npy"))


def test_pretrain_resume(tmp_path):
    """--resume restores optimizer state + epoch + best and continues:
    2 epochs then resume for 2 more == the log shows epochs 3..4 and the
    restored best carries over."""
    from squeezedet_tpu.pretrain import pretrain

    data_dir = str(tmp_path / "crops")
    _write_crop_dataset(data_dir, n_train=64, n_val=32)
    common = dict(
        mode="pretrain", data_dir=data_dir,
        lr=0.01, batch_size=16, val_intervals=2, save_intervals=2,
        dropout_prob=0.0, seed=3,
    )
    cfg = Config(num_epochs=2, exp_id="pretrain_resume", **common)
    cfg.finalize_dirs(root_dir=str(tmp_path))
    pretrain(cfg)
    state_last = os.path.join(cfg.save_dir, "state_last")
    assert os.path.exists(state_last)

    # separate exp dir: both runs can start within the same wall-clock
    # minute (warm compile cache), which would merge their timestamped
    # logs_* dirs and poison the log assertions below
    cfg2 = Config(
        num_epochs=4, resume=state_last, exp_id="pretrain_resume2", **common
    )
    cfg2.finalize_dirs(root_dir=str(tmp_path))
    pretrain(cfg2)

    log_dirs = sorted(
        d for d in os.listdir(cfg2.save_dir) if d.startswith("logs_")
    )
    log = open(os.path.join(cfg2.save_dir, log_dirs[-1], "log.txt")).read()
    assert "resumed" in log
    assert "epoch 3" in log and "epoch 4" in log
    assert "epoch 2   train" not in log  # continued, not restarted


def test_step_indices_positions():
    from squeezedet_tpu.pretrain import _step_indices

    pos = _step_indices(10, 4)
    assert pos.shape == (3, 4)
    # linear positions, NOT pre-wrapped: the tail pad (>= n) must stay
    # distinguishable so the eval fn can mask it out of the accuracy
    assert pos[-1, -1] == 11 and pos.max() == 11


def test_eval_masks_nondivisible_val():
    """Wrap-padded eval slots must not be double-counted: accuracy over a
    val set with n % batch != 0 equals the direct per-sample accuracy."""
    from squeezedet_tpu.pretrain import _step_indices, make_eval_fn
    from squeezedet_tpu.parallel.mesh import make_mesh

    spec = ClassifierSpec(num_classes=3, dropout_prob=0.0)
    params = init_classifier_params(jax.random.PRNGKey(0), spec)
    n, batch = 22, 16  # 2 steps, 10 pad slots
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (n, 48, 48, 3)).astype(np.uint8)
    labels = rng.integers(0, 3, n).astype(np.int32)
    mean, std = [128.0] * 3, [64.0] * 3

    eval_fn = make_eval_fn(spec, make_mesh(1), mean, std)
    acc = float(
        eval_fn(params, images, labels, _step_indices(n, batch), n)
    )

    x = (images.astype(np.float32) - np.array(mean)) / np.array(std)
    logits = np.asarray(forward_classifier(params, jnp.asarray(x), spec))
    direct = float((logits.argmax(-1) == labels).mean())
    assert abs(acc - direct) < 1e-6


def test_forward_classifier_torch_parity():
    """Repo convention: every numerical component gets an independent
    torch oracle. Covers the trunk prefix + head (incl. the deliberate
    no-ReLU pooling)."""
    from tests.torch_oracle import forward_classifier_torch

    spec = ClassifierSpec(num_classes=5, dropout_prob=0.0)
    params = init_classifier_params(jax.random.PRNGKey(11), spec)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(12), (2, 96, 96, 3))
    )
    ours = np.asarray(forward_classifier(params, jnp.asarray(x), spec))
    oracle = forward_classifier_torch(
        jax.tree.map(np.asarray, params), x, spec
    )
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)
