import numpy as np
import pytest

from squeezedet_tpu.config import Config, build_parser, parse


def test_defaults_match_reference():
    cfg = parse(["train"])
    assert cfg.lr == 0.01
    assert cfg.momentum == 0.9
    assert cfg.weight_decay == 1e-4
    assert cfg.grad_norm == 5.0
    assert cfg.num_epochs == 300
    assert cfg.batch_size == 20
    assert cfg.val_intervals == 5
    assert cfg.flip_prob == 0.5
    assert cfg.drift_prob == 1.0
    assert cfg.class_loss_weight == 1.0
    assert cfg.positive_score_loss_weight == 3.75
    assert cfg.negative_score_loss_weight == 100.0
    assert cfg.bbox_loss_weight == 6.0
    assert cfg.nms_thresh == 0.4
    assert cfg.score_thresh == 0.3
    assert cfg.keep_top_k == 64
    assert cfg.seed == 42
    assert cfg.arch == "squeezedet"
    assert cfg.dropout_prob == 0.5


def test_flag_overrides():
    cfg = parse(
        ["eval", "--arch", "squeezedetplus", "--batch_size", "8",
         "--no_eval", "--forbid_resize", "--mixed_precision",
         "--load_model", "/x/y.pth", "--nms_thresh", "0.5"]
    )
    assert cfg.mode == "eval"
    assert cfg.arch == "squeezedetplus"
    assert cfg.batch_size == 8
    assert cfg.no_eval and cfg.forbid_resize and cfg.mixed_precision
    assert cfg.load_model == "/x/y.pth"
    assert cfg.nms_thresh == 0.5


def test_bool_flags_can_be_disabled():
    # default-True flags must have a working off switch (argparse
    # BooleanOptionalAction); plain store_true silently ignored --no_*
    cfg = parse(["train", "--no_cache_images", "--no_native_loader"])
    assert cfg.cache_images is False
    assert cfg.native_loader is False
    # explicit on and defaults still work
    cfg = parse(["train", "--cache_images"])
    assert cfg.cache_images is True
    cfg = parse(["train"])
    assert cfg.cache_images is True and cfg.native_loader is True


def test_reference_compat_flags_accepted():
    cfg = parse(["train", "--gpus", "0,1", "--master_batch_size", "4",
                 "--not_cuda_benchmark"])
    assert cfg.gpus == "0,1"  # accepted; device selection is the mesh


def test_dirs_derived():
    cfg = parse(["train", "--exp_id", "abc"])
    assert cfg.save_dir.endswith("exp/abc")
    assert cfg.debug_dir.endswith("exp/abc/debug")


def test_update_dataset_info():
    class DS:
        input_size = (96, 160)
        rgb_mean = np.zeros((1, 1, 3))
        rgb_std = np.ones((1, 1, 3))
        class_names = ("a", "b")
        num_classes = 2
        anchors = np.zeros((60, 4))
        anchors_per_grid = 1
        num_anchors = 60

    cfg = Config(mode="train").update_dataset_info(DS())
    assert cfg.num_classes == 2
    assert cfg.num_anchors == 60
    assert "num_epochs" in cfg.describe()


def test_cli_crash_only_exit_code():
    """main.py exits rc=13 via os._exit on any unhandled exception so a
    wedged TPU runtime can never turn a failed run into a hung one (the
    supervisor depends on the process dying)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "main.py"), "train",
         "--dataset", "no_such_dataset"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 13, (out.returncode, out.stderr[-500:])


def test_explicit_score_thresh_survives_dataset_default():
    """An explicit --score_thresh equal to the dataclass default must NOT
    be replaced by a dataset protocol default (the parser records which
    flags were actually on the command line)."""

    class _DS:  # minimal dataset surface for update_dataset_info
        input_size = (4, 4)
        rgb_mean = rgb_std = 1.0
        class_names = ("a",)
        num_classes = 1
        anchors = None
        anchors_per_grid = 1
        num_anchors = 1
        default_score_thresh = 0.01

    cfg = parse(["eval", "--score_thresh", "0.3"])
    cfg.update_dataset_info(_DS())
    assert cfg.score_thresh == 0.3  # explicit value kept

    cfg = parse(["eval"])
    cfg.update_dataset_info(_DS())
    assert cfg.score_thresh == 0.01  # defaulted -> protocol default applies
