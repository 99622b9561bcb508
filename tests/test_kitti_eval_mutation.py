"""Mutation matrix for the pure-Python KITTI devkit evaluator twin.

tests/test_kitti_eval.py proves the C++ and Python twins agree
byte-for-byte — but both were written in this repo, so agreement alone
cannot catch a shared misreading of the devkit protocol. Like
tests/test_coco_mutation.py, this file flips one protocol rule at a time
in a textually-mutated copy of utils/kitti_eval.py and asserts that at
least one hand-built scene changes ANY output file (stats_* + plot
curves). Every rule the devkit evaluator is trusted for is therefore
load-bearing in the suite: neighbour-class ignore, DontCare absorption,
the strict IoU gate, difficulty gating (height/occlusion), the
41-threshold tail push, right-monotonicization, and 11-point sampling.
"""

from __future__ import annotations

import inspect
import os

import pytest

import squeezedet_tpu.utils.kitti_eval as kitti_eval

from tests.test_kitti_eval import (
    _det_row,
    _gt_row,
    _perfect_frames,
    _read_stats,
    _write_scene,
)


# ---------------------------------------------------------------------------
# Scenes. A 50-frame perfect backdrop fills the recall grid so one
# protocol-rule frame shifts thresholds/curves measurably.
# ---------------------------------------------------------------------------

def scene_van_ignored():
    """A det exactly on a Van GT must be absorbed (neighbour class of
    car), never counted FP."""
    frames = _perfect_frames(50)
    box = (300.0, 60.0, 500.0, 200.0)
    frames.append(([_gt_row("Van", *box)], [_det_row("Car", *box, 0.98)]))
    return frames


def scene_dontcare_absorbs():
    """A det inside a DontCare region is absorbed (criterion-0 overlap)."""
    frames = _perfect_frames(50)
    frames.append((
        [_gt_row("DontCare", 300, 60, 600, 260)],
        [_det_row("Car", 350, 80, 500, 200, 0.98)],
    ))
    return frames


def scene_iou_boundary():
    """A det at IoU EXACTLY 0.7 vs a car GT does not match (the devkit
    gate is strictly greater-than): it is an FP and the GT an FN."""
    frames = _perfect_frames(50)
    # gt 100x100, det 100x70 fully inside: IoU = 7000/10000 = 0.7
    frames.append((
        [_gt_row("Car", 100, 60, 200, 160)],
        [_det_row("Car", 100, 60, 200, 130, 0.98)],
    ))
    return frames


def scene_partial_recall():
    """50 counted GT, only 43 detected: max recall 0.86 exercises the
    threshold builder's tail push (fills sample 0.875, leaves the rest
    empty) and leaves 11-point samples above 0.9 at precision 0."""
    frames = _perfect_frames(50)
    return [
        (gt, det if i < 43 else []) for i, (gt, det) in enumerate(frames)
    ]


def scene_precision_dip():
    """An FP between the top two TP scores: raw precision dips at the
    second threshold (2 TP / 1 FP) then recovers toward 50/51, so
    right-monotonicization must lift the dipped middle samples."""
    frames = _perfect_frames(50)
    frames.append(([], [_det_row("Car", 700, 30, 850, 170, 0.985)]))
    return frames


def scene_gate_boundaries():
    """A height-EXACTLY-40 GT (easy-eligible: gates are inclusive) and an
    occlusion-2 GT (hard-eligible), both perfectly detected."""
    frames = _perfect_frames(50)
    # UNDETECTED height-40.0 GT: counted in easy (inclusive gate) it caps
    # recall at 50/51 and dents the AP; excluded (mutant) easy is perfect
    # again — a detected boundary GT would change nothing (all-1 curves)
    frames.append(([_gt_row("Car", 100, 60, 300, 100.0)], []))
    frames.append((
        [_gt_row("Car", 400, 60, 600, 220, occ=2)],       # occ == 2
        [_det_row("Car", 400, 60, 600, 220, 0.96)],
    ))
    return frames


SCENES = {
    "van_ignored": scene_van_ignored,
    "dontcare_absorbs": scene_dontcare_absorbs,
    "iou_boundary": scene_iou_boundary,
    "partial_recall": scene_partial_recall,
    "precision_dip": scene_precision_dip,
    "gate_boundaries": scene_gate_boundaries,
}


MUTATIONS = {
    # Van no longer a neighbour class of car (absorbed det becomes FP)
    "van_not_ignored": (
        'elif cls == 0 and t == "van":\n            relation = 0',
        'elif cls == 0 and t == "van":\n            relation = -1',
    ),
    # DontCare regions stop absorbing unmatched detections
    "no_dontcare_absorb": (
        "if _overlap(d.box, dc, 0) > min_ov:",
        "if False:",
    ),
    # IoU gate becomes inclusive (devkit is strictly greater-than)
    "iou_gate_inclusive": (
        "if ov <= min_ov:",
        "if ov < min_ov:",
    ),
    # threshold builder loses its always-push-the-last-score tail rule
    "no_tail_push": (
        "if (right - current) < (current - left) and i < len(scores) - 1:",
        "if (right - current) < (current - left):",
    ),
    # precision no longer monotonicized from the right
    "no_monotonicization": (
        "precision[t] = precision[t:].max()",
        "precision[t] = precision[t]",
    ),
    # 11-point AP sampled as the first 11 instead of every 4th of 41
    "wrong_11pt_sampling": (
        "samples = precision[::4]",
        "samples = precision[:11]",
    ),
    # height gate becomes exclusive (a height-40.0 GT leaves easy)
    "height_gate_exclusive": (
        "and height >= MIN_HEIGHT[difficulty]",
        "and height > MIN_HEIGHT[difficulty]",
    ),
    # occlusion gate becomes exclusive (occ-2 GT leaves hard)
    "occlusion_gate_exclusive": (
        "g.occlusion <= MAX_OCCLUSION[difficulty]",
        "g.occlusion < MAX_OCCLUSION[difficulty]",
    ),
}


def _mutated_module(old: str, new: str):
    src = inspect.getsource(kitti_eval)
    assert src.count(old) == 1, (
        f"mutation anchor not unique/found ({src.count(old)} hits): {old!r}"
    )
    # the module computes _NATIVE_DIR from __file__ at import time
    ns: dict = {"__file__": kitti_eval.__file__}
    exec(compile(src.replace(old, new), "<kitti-eval-mutant>", "exec"), ns)
    return ns["evaluate_python"]


def _run(eval_fn, frames, tmp_path) -> dict[str, str]:
    gt_dir, image_set, results_dir, n = _write_scene(tmp_path, frames)
    eval_fn(gt_dir, image_set, results_dir, n)
    out = _read_stats(results_dir)
    plot_dir = os.path.join(results_dir, "plot")
    for name in sorted(os.listdir(plot_dir)):
        with open(os.path.join(plot_dir, name)) as fp:
            out["plot/" + name] = fp.read()
    assert out, "evaluator produced no stats files"
    return out


@pytest.fixture(scope="module")
def baselines(tmp_path_factory):
    """Unmutated outputs per scene, computed once."""
    out = {}
    for name, build in SCENES.items():
        out[name] = _run(
            kitti_eval.evaluate_python, build(),
            tmp_path_factory.mktemp(f"base_{name}"),
        )
    return out


@pytest.mark.parametrize("name", sorted(MUTATIONS))
def test_mutation_detected(name, baselines, tmp_path_factory):
    old, new = MUTATIONS[name]
    mutant = _mutated_module(old, new)
    for scene_name, build in SCENES.items():
        got = _run(
            mutant, build(), tmp_path_factory.mktemp(f"{name}_{scene_name}")
        )
        if got != baselines[scene_name]:
            return  # detected
    pytest.fail(f"mutation {name!r} survived every scene")


def test_scene_baseline_sanity(baselines):
    """The backdrop really is perfect (AP 1.0) and the rule scenes shift
    it the way the protocol says they should."""
    from squeezedet_tpu.utils.kitti_eval import parse_aps

    def car_easy(stats: dict[str, str]) -> float:
        return float(stats["stats_car_ap.txt"].splitlines()[0].split("=")[1])

    # absorbed-not-FP scenes stay perfect
    assert car_easy(baselines["van_ignored"]) == 1.0
    assert car_easy(baselines["dontcare_absorbs"]) == 1.0
    # an exact-0.7-IoU det is an FP -> easy AP dips below 1
    assert car_easy(baselines["iou_boundary"]) < 1.0
    # 43/50 recall: samples 0..0.8 filled at precision 1, 0.9/1.0 empty
    assert abs(car_easy(baselines["partial_recall"]) - 9 / 11) < 1e-6
    # the single FP costs a little precision but monotonicization lifts
    # the dipped middle thresholds back toward the 50/51 tail
    assert 0.9 < car_easy(baselines["precision_dip"]) < 1.0
