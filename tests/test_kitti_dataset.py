import os

import numpy as np
import pytest

from squeezedet_tpu.config import Config
from squeezedet_tpu.data.kitti import KITTI

from tests.test_e2e import TinyKITTI, _make_kitti_tree


def _cfg(tmp_path, **overrides):
    cfg = Config(mode="eval", **overrides)
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")
    return cfg


@pytest.fixture()
def kitti(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    return KITTI("val", _cfg(tmp_path))


def test_constants_and_anchor_grid(kitti):
    assert kitti.input_size == (384, 1248)
    assert kitti.grid_size == (24, 78)
    assert kitti.num_anchors == 16848
    assert kitti.anchors.shape == (16848, 4)
    assert len(kitti) == 4


def test_label_parsing_filters_classes(tmp_path, kitti):
    # append lines with ignored classes to image 0's label file
    label = os.path.join(
        kitti.data_dir, "training/label_2", kitti.sample_ids[0] + ".txt"
    )
    with open(label, "a") as fp:
        fp.write("Van 0.0 0 0.0 1.00 2.00 30.00 40.00 1 1 1 0 0 0 0\n")
        fp.write("DontCare -1 -1 -10 5.00 6.00 70.00 80.00 -1 -1 -1 -1000 -1000 -1000 -10\n")
    class_ids, boxes = kitti.load_annotations(0)
    # only Car + Pedestrian from the fixture survive the class filter
    assert class_ids.tolist() == [0, 1]
    assert boxes.shape == (2, 4)


def test_load_image_shape(kitti):
    image, image_id = kitti.load_image(0)
    assert image.shape == (200, 600, 3)
    assert image.dtype == np.float32
    assert image_id == kitti.sample_ids[0]


def test_save_results_format(tmp_path, kitti):
    results = [
        {
            "image_meta": {"image_id": "000000"},
            "class_ids": np.array([0, 2]),
            "scores": np.array([0.9123, 0.5]),
            "boxes": np.array([[1.0, 2.0, 30.0, 40.0], [5.0, 6.0, 70.0, 80.0]]),
        },
        {"image_meta": {"image_id": "000001"}},  # no detections -> empty file
    ]
    kitti.save_results(results)
    data = open(os.path.join(kitti.results_dir, "data", "000000.txt")).read()
    lines = data.strip().split("\n")
    assert lines[0] == "car -1 -1 0 1.00 2.00 30.00 40.00 0 0 0 0 0 0 0 0.912"
    assert lines[1].startswith("cyclist -1 -1 0 ")
    assert open(os.path.join(kitti.results_dir, "data", "000001.txt")).read() == ""


def test_getitem_forbid_resize(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path, forbid_resize=True)
    ds = TinyKITTI("val", cfg)
    item = ds[0]
    # 200x600 source center-cropped to 96x160 (no resize)
    assert item["image"].shape == (96, 160, 3)
    meta = item["image_meta"]
    assert "scales" not in meta
    assert "crops" in meta and "padding" in meta
    np.testing.assert_array_equal(meta["crops"], [52, 52, 220, 220])


def test_getitem_gt_encoding(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    ds = TinyKITTI("val", _cfg(tmp_path))
    item = ds[0]
    gt = item["gt"]
    assert gt.shape == (ds.num_anchors, ds.num_classes + 9)
    assert gt[:, 0].sum() == 2  # two objects matched
    assert item["image"].shape == (96, 160, 3)


def test_pr_curve_plotting(tmp_path):
    from squeezedet_tpu.utils.kitti_eval import plot_pr_curves

    plot_dir = tmp_path / "results" / "plot"
    plot_dir.mkdir(parents=True)
    data = np.stack(
        [np.linspace(0, 1, 41), *(np.linspace(1, 0, 41) for _ in range(3))], axis=1
    )
    np.savetxt(plot_dir / "car_detection.txt", data)
    written = plot_pr_curves(str(tmp_path / "results"))
    assert len(written) == 1
    assert written[0].endswith("car_detection.png")
    assert os.path.getsize(written[0]) > 0


def test_anchor_seeds_file_override(tmp_path):
    """--anchor_seeds_file swaps the built-in k-means seeds for a refit
    (K, 2) table; anchor count and per-grid width follow K."""
    _make_kitti_tree(str(tmp_path / "data"))
    seeds = np.array([[40, 30], [120, 60], [300, 130], [420, 145]], np.int64)
    np.savetxt(tmp_path / "seeds.txt", seeds, fmt="%d")
    ds = KITTI("val", _cfg(tmp_path, anchor_seeds_file=str(tmp_path / "seeds.txt")))
    assert ds.anchors_per_grid == 4
    assert ds.num_anchors == 24 * 78 * 4
    np.testing.assert_array_equal(ds.anchors_seed, seeds.astype(np.float32))
    # the widest refit shape must appear verbatim in the grid
    assert (ds.anchors[:, 2:] == np.array([420, 145])).all(axis=1).any()


def test_anchor_seeds_file_rejects_garbage(tmp_path):
    _make_kitti_tree(str(tmp_path / "data"))
    np.savetxt(tmp_path / "bad.txt", np.array([[0, -3], [10, 10]]), fmt="%d")
    with pytest.raises(ValueError, match="positive"):
        KITTI("val", _cfg(tmp_path, anchor_seeds_file=str(tmp_path / "bad.txt")))
