"""Cross-validate the native C++ KITTI evaluator against the independent
pure-Python implementation on synthetic scenes, plus hand-checkable cases."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from squeezedet_tpu.utils.kitti_eval import (
    evaluate_python,
    native_binary,
    parse_aps,
    run_kitti_eval,
)

CLASSES = ("Car", "Pedestrian", "Cyclist")


def _write_scene(tmp_path, frames):
    """frames: list of (gt_rows, det_rows); rows are raw txt lines."""
    gt_dir = tmp_path / "training" / "label_2"
    det_dir = tmp_path / "results" / "data"
    gt_dir.mkdir(parents=True, exist_ok=True)
    det_dir.mkdir(parents=True, exist_ok=True)
    ids = []
    for i, (gt_rows, det_rows) in enumerate(frames):
        fid = f"{i:06d}"
        ids.append(fid)
        (gt_dir / f"{fid}.txt").write_text("".join(gt_rows))
        (det_dir / f"{fid}.txt").write_text("".join(det_rows))
    image_set = tmp_path / "val.txt"
    image_set.write_text("\n".join(ids) + "\n")
    return str(tmp_path / "training"), str(image_set), str(tmp_path / "results"), len(ids)


def _gt_row(cls, x1, y1, x2, y2, trunc=0.0, occ=0, alpha=0.0):
    return (
        f"{cls} {trunc:.2f} {occ} {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}"
        " 1 1 1 0 0 0 0\n"
    )


def _det_row(cls, x1, y1, x2, y2, score, alpha=0.0):
    return (
        f"{cls} -1 -1 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}"
        f" 0 0 0 0 0 0 0 {score:.3f}\n"
    )


def _random_frames(rng, n_frames=12):
    frames = []
    for _ in range(n_frames):
        gt_rows, det_rows = [], []
        for _ in range(rng.integers(0, 6)):
            cls = rng.choice(["Car", "Pedestrian", "Cyclist", "Van", "Tram", "DontCare"])
            x1 = rng.uniform(0, 1000)
            y1 = rng.uniform(0, 200)
            w = rng.uniform(20, 200)
            h = rng.uniform(20, 120)
            trunc = float(rng.uniform(0, 0.6))
            occ = int(rng.integers(0, 4))
            gt_rows.append(_gt_row(cls, x1, y1, x1 + w, y1 + h, trunc, occ))
            # sometimes a matching detection with jitter, sometimes none
            if rng.uniform() < 0.75 and cls in ("Car", "Pedestrian", "Cyclist"):
                jx, jy = rng.uniform(-8, 8, 2)
                det_rows.append(
                    _det_row(cls, x1 + jx, y1 + jy, x1 + w + jx, y1 + h + jy,
                             rng.uniform(0.1, 1.0))
                )
        for _ in range(rng.integers(0, 3)):  # pure false positives
            cls = rng.choice(["Car", "Pedestrian", "Cyclist"])
            x1 = rng.uniform(0, 1000)
            y1 = rng.uniform(0, 200)
            det_rows.append(
                _det_row(cls, x1, y1, x1 + rng.uniform(20, 150),
                         y1 + rng.uniform(20, 100), rng.uniform(0.1, 1.0))
            )
        frames.append((gt_rows, det_rows))
    return frames


def _read_stats(results_dir):
    out = {}
    for name in os.listdir(results_dir):
        if name.startswith("stats_") and name.endswith(".txt"):
            with open(os.path.join(results_dir, name)) as fp:
                out[name] = fp.read()
    return out


def _perfect_frames(n=50, cls="Car", height=150, score0=0.99):
    """n frames with one exactly-matched detection each, distinct scores.

    ~50 TPs fill all 41 recall sample points, so perfect detections give
    AP = 1 (with few TPs the devkit leaves trailing samples at precision 0
    — e.g. 2 TPs give AP = 1/11, which is correct devkit behavior)."""
    frames = []
    for i in range(n):
        x1, y1 = 100 + (i % 7) * 10, 80 + (i % 5) * 10
        box = (x1, y1, x1 + 200, y1 + height)
        frames.append(
            ([_gt_row(cls, *box)], [_det_row(cls, *box, score0 - i * 0.01)])
        )
    return frames


def test_perfect_detections_give_ap_1(tmp_path):
    gt_dir, image_set, results, n = _write_scene(tmp_path, _perfect_frames())
    evaluate_python(gt_dir, image_set, results, n)
    aps = parse_aps(results)
    assert aps["Car_easy"] == pytest.approx(1.0)
    assert aps["Car_moderate"] == pytest.approx(1.0)
    assert aps["Car_hard"] == pytest.approx(1.0)
    # no pedestrian/cyclist detections -> absent stats files -> AP 0
    assert aps["Pedestrian_easy"] == 0.0
    assert aps["mAP"] == pytest.approx(3 / 9)


def test_few_tp_ap_undersampling(tmp_path):
    # devkit semantics: 2 TPs only populate 1 of the 11 AP sample points
    gt_dir, image_set, results, n = _write_scene(tmp_path, _perfect_frames(2))
    evaluate_python(gt_dir, image_set, results, n)
    aps = parse_aps(results)
    assert aps["Car_easy"] == pytest.approx(1.0 / 11.0, abs=1e-5)


def test_difficulty_gating_short_boxes(tmp_path):
    # 30px-tall Cars: excluded from easy (min height 40), counted in mod/hard
    gt_dir, image_set, results, n = _write_scene(
        tmp_path, _perfect_frames(50, height=30)
    )
    evaluate_python(gt_dir, image_set, results, n)
    aps = parse_aps(results)
    # easy: gts ignored; their detections are absorbed (assigned to ignored
    # gt), so no FPs either -> no thresholds -> AP 0
    assert aps["Car_easy"] == 0.0
    assert aps["Car_moderate"] == pytest.approx(1.0)
    assert aps["Car_hard"] == pytest.approx(1.0)


def test_van_ignored_for_car(tmp_path):
    # a Car detection on a Van gt is absorbed by neighbour-class ignore
    # rather than counting as FP -> AP stays 1
    frames = _perfect_frames(50)
    frames[0][0].append(_gt_row("Van", 600, 100, 800, 250))
    frames[0][1].append(_det_row("Car", 600, 100, 800, 250, 0.999))
    gt_dir, image_set, results, n = _write_scene(tmp_path, frames)
    evaluate_python(gt_dir, image_set, results, n)
    aps = parse_aps(results)
    assert aps["Car_easy"] == pytest.approx(1.0)


def test_fp_lowers_ap(tmp_path):
    # same scene but the extra detection hits empty space -> a real FP at
    # the top of the ranking drags precision below 1 somewhere
    frames = _perfect_frames(50)
    frames[0][1].append(_det_row("Car", 600, 100, 800, 250, 0.999))
    gt_dir, image_set, results, n = _write_scene(tmp_path, frames)
    evaluate_python(gt_dir, image_set, results, n)
    aps = parse_aps(results)
    assert aps["Car_easy"] < 1.0


def test_dontcare_absorbs_fp(tmp_path):
    # the same spurious detection inside a DontCare region is absorbed
    frames = _perfect_frames(50)
    frames[0][0].append(_gt_row("DontCare", 590, 90, 810, 260, -1, -1))
    frames[0][1].append(_det_row("Car", 600, 100, 800, 250, 0.999))
    gt_dir, image_set, results, n = _write_scene(tmp_path, frames)
    evaluate_python(gt_dir, image_set, results, n)
    aps = parse_aps(results)
    assert aps["Car_easy"] == pytest.approx(1.0)


def test_aos_orientation_scoring(tmp_path):
    """Detections with wrong orientation keep AP=1 but drag AOS below 1;
    perfect orientations give AOS=1 at every populated sample."""
    import math

    frames_good = _perfect_frames(50)
    gt_dir, image_set, results, n = _write_scene(tmp_path / "good", frames_good)
    evaluate_python(gt_dir, image_set, results, n)
    ori = np.loadtxt(
        os.path.join(results, "stats_car_orientation.txt")
    )
    det = np.loadtxt(os.path.join(results, "stats_car_detection.txt"))
    # where precision is populated, orientation similarity equals it
    np.testing.assert_allclose(ori[:, ::4], det, atol=1e-6)

    # flip every detection's alpha by pi -> similarity (1+cos(pi))/2 = 0
    frames_bad = _perfect_frames(50)
    for gt_rows, det_rows in frames_bad:
        det_rows[0] = det_rows[0].replace(" 0.00 ", f" {math.pi:.2f} ", 1)
    gt_dir, image_set, results2, n = _write_scene(tmp_path / "bad", frames_bad)
    evaluate_python(gt_dir, image_set, results2, n)
    aps = parse_aps(results2)
    assert aps["Car_easy"] == pytest.approx(1.0)  # AP unaffected
    ori2 = np.loadtxt(os.path.join(results2, "stats_car_orientation.txt"))
    assert ori2.max() < 0.01  # orientation similarity collapses


@pytest.mark.skipif(native_binary() is None, reason="native evaluator not built")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(tmp_path, seed):
    rng = np.random.default_rng(seed)
    frames = _random_frames(rng)
    gt_dir, image_set, results_native, n = _write_scene(tmp_path, frames)

    results_py = results_native + "_py"
    shutil.copytree(results_native, results_py)

    run_kitti_eval(gt_dir, image_set, results_native, n)  # native binary
    evaluate_python(gt_dir, image_set, results_py, n)

    native_stats = _read_stats(results_native)
    py_stats = _read_stats(results_py)
    assert native_stats.keys() == py_stats.keys()
    assert len(native_stats) > 0
    for name in native_stats:
        assert native_stats[name] == py_stats[name], name


@pytest.mark.parametrize("force_python", [True, False])
def test_stale_stats_removed_for_unseen_class(tmp_path, force_python):
    """Re-evaluating into the same results_dir must delete stats files for
    classes with zero detections this run — a stale file from a previous
    eval would be parsed as THIS run's AP, inflating mAP and best-model
    selection (found by review; both evaluator twins)."""
    gt_dir, image_set, results, n = _write_scene(tmp_path, _perfect_frames())
    stale = os.path.join(results, "stats_pedestrian_ap.txt")
    with open(stale, "w") as fp:  # pretend an earlier epoch detected peds
        fp.write("AP=0.9\nAP=0.9\nAP=0.9\n")
    run_kitti_eval(gt_dir, image_set, results, n, force_python=force_python)
    assert not os.path.exists(stale)
    aps = parse_aps(results)
    assert aps["Pedestrian_easy"] == 0.0
    assert aps["Car_easy"] == pytest.approx(1.0)
