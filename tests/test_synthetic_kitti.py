"""The hard synthetic KITTI proxy: label statistics must stay in the
real-KITTI bands (this is the property that makes mAP on it meaningful —
the round-1 200-image set saturated at Car AP 1.000), and the output must
load through the real KITTI dataset class."""

import collections
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_synthetic_kitti import generate  # noqa: E402


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("synthhard")
    generate(str(out), n_train=48, n_val=12, seed=7)
    return str(out)


def _labels(root):
    objs = []
    for f in sorted(glob.glob(os.path.join(root, "kitti/training/label_2/*.txt"))):
        rows = []
        for line in open(f):
            p = line.split()
            rows.append((p[0], float(p[1]), int(p[2]),
                         [float(v) for v in p[4:8]]))
        objs.append(rows)
    return objs


def test_label_statistics_match_kitti_bands(synth_root):
    per_image = _labels(synth_root)
    scored = [o for rows in per_image for o in rows
              if o[0] in ("Car", "Pedestrian", "Cyclist")]
    heights = np.array([b[3] - b[1] for _, _, _, b in scored])
    occs = np.array([o[2] for o in scored])
    truncs = np.array([o[1] for o in scored])
    names = collections.Counter(o[0] for o in scored)

    # objects per image ~ KITTI's ~5.3 (scored classes ~4.5)
    counts = [sum(1 for o in rows if o[0] != "DontCare") for rows in per_image]
    assert 3.0 < np.mean(counts) < 8.0

    # long-tailed height distribution around the devkit gates (40/25/25)
    assert 30 < np.median(heights) < 75
    assert 0.10 < (heights < 25).mean() < 0.40  # sub-hard-gate tail exists
    assert (heights >= 40).mean() > 0.4  # easy-eligible mass exists

    # class mix: Car-dominant, Ped > Cyc, all three present
    assert names["Car"] > names["Pedestrian"] > names["Cyclist"] > 0

    # occlusion levels all populated; most objects unoccluded
    occ_frac = collections.Counter(occs.tolist())
    assert occ_frac[0] / len(occs) > 0.5
    assert occ_frac[1] > 0 and occ_frac[2] > 0

    # some truncation but not dominant
    assert 0.02 < (truncs > 0.1).mean() < 0.35

    # neighbor-class (Van) and DontCare rows exist -> devkit ignore logic
    # is exercised by this data
    all_names = collections.Counter(
        o[0] for rows in per_image for o in rows
    )
    assert all_names["Van"] > 0 and all_names["DontCare"] > 0


def test_loads_through_kitti_dataset(synth_root):
    from squeezedet_tpu.config import Config
    from squeezedet_tpu.data.kitti import KITTI

    cfg = Config(mode="train", drift_prob=1.0, flip_prob=0.5)
    cfg.finalize_dirs(root_dir=synth_root)
    cfg.data_dir = synth_root

    ds = KITTI("train", cfg)
    assert len(ds) == 48
    sample = ds[0]
    assert sample["image"].shape == (*ds.input_size, 3)
    assert sample["gt"].shape == (ds.num_anchors, ds.num_classes + 9)
    assert np.isfinite(sample["image"]).all()
    # at least one positive anchor in a typical scene
    assert sample["gt"][:, 0].sum() >= 1

    val = KITTI("val", cfg)
    assert len(val) == 12
