"""Adversarial hardening of the COCOeval twin (utils/coco_eval.py).

Two layers, closing the correlated-error risk of self-parity (the twin's
other tests compare it against a brute-force reimplementation by the same
author):

1. GOLDEN VECTORS — scenarios whose 12-metric outputs are hand-computed
   from pycocotools' documented semantics (cocoeval.py evaluateImg/
   accumulate), one per protocol rule: crowd absorption, inclusive area
   bounds, maxDets truncation order, ignored-GT fallback + the
   never-downgrade rule, out-of-range unmatched detections, 101-point
   interpolation with searchsorted(side="left"), right-monotonization.

2. MUTATION MATRIX — for each protocol rule, flip exactly that rule in a
   textually-mutated copy of the evaluator module and assert at least one
   golden scenario changes its output. A mutation that no test can detect
   would mean the rule is untested; the matrix proves every rule is
   load-bearing.
"""

from __future__ import annotations

import numpy as np
import pytest

import squeezedet_tpu.utils.coco_eval as coco_eval
from squeezedet_tpu.utils.coco_eval import evaluate_coco_files


def _gt_json(annotations, categories=(1,), images=(1,)):
    return {
        "images": [{"id": i} for i in images],
        "annotations": [
            dict(
                id=k, image_id=a[0], category_id=a[1],
                bbox=list(map(float, a[2])),
                area=float(a[2][2] * a[2][3]),
                iscrowd=a[3] if len(a) > 3 else 0,
            )
            for k, a in enumerate(annotations)
        ],
        "categories": [{"id": c, "name": f"cat{c}"} for c in categories],
    }


def _det(image_id, cat, bbox, score):
    return {"image_id": image_id, "category_id": cat,
            "bbox": list(map(float, bbox)), "score": float(score)}


# ---------------------------------------------------------------------------
# Golden scenarios. Each returns (gt_json, detections); the hand-computed
# expectations live in the test functions below, the mutation matrix reuses
# the scenario builders.
# ---------------------------------------------------------------------------

def scenario_crowd_absorb():
    """Two detections on a crowd region + one TP on a real GT.

    Crowd IoU = intersection / det-area, so both crowd dets match the
    (ignored) crowd GT at every threshold and are neither TP nor FP; the
    crowd can absorb BOTH (a matched crowd GT stays available). Only the
    real GT counts: npig=1, the 0.7-score det is a perfect TP -> AP 1.0.
    """
    gt = _gt_json([
        (1, 1, (0, 0, 10, 10), 1),      # crowd
        (1, 1, (50, 50, 10, 10), 0),    # real
    ])
    dets = [
        _det(1, 1, (0, 0, 10, 10), 0.9),   # inside crowd, union-IoU 1.0
        _det(1, 1, (1, 1, 8, 8), 0.8),     # inside crowd, union-IoU 0.39
        _det(1, 1, (50, 50, 10, 10), 0.7),  # perfect on the real GT
    ]
    return gt, dets


def scenario_area_bounds():
    """GT with area EXACTLY 32^2 belongs to both small and medium
    (pycocotools bounds are inclusive on both ends)."""
    gt = _gt_json([
        (1, 1, (0, 0, 32, 32), 0),        # area 1024 == 32^2
        (1, 1, (100, 100, 100, 100), 0),  # area 10000 (large)
    ])
    dets = [
        _det(1, 1, (0, 0, 32, 32), 0.9),
        _det(1, 1, (100, 100, 100, 100), 0.8),
    ]
    return gt, dets


def scenario_maxdets():
    """Two high-scoring junk dets above one perfect det: maxDets
    truncation keeps the TOP-k by score BEFORE matching, so AR1 sees only
    junk (AR1=0) while AR10/AR100 recover the TP."""
    gt = _gt_json([(1, 1, (0, 0, 10, 10), 0)])
    dets = [
        _det(1, 1, (200, 0, 5, 5), 0.95),
        _det(1, 1, (210, 0, 5, 5), 0.94),
        _det(1, 1, (0, 0, 10, 10), 0.5),
    ]
    return gt, dets


def scenario_prefer_real_gt():
    """A det overlapping a real GT (IoU 0.9) and a same-place crowd GT
    (crowd-IoU 1.0). Ignored GT sort last and, once a real GT is best,
    the scan BREAKS before any ignored GT can steal the match — so the
    det is a TP for thresholds <= 0.9 despite the crowd's higher IoU."""
    gt = _gt_json([
        (1, 1, (0, 0, 10, 10), 1),   # crowd listed FIRST on purpose
        (1, 1, (0, 0, 10, 9), 0),    # real, IoU 0.9 vs the det
    ])
    dets = [_det(1, 1, (0, 0, 10, 10), 0.9)]
    return gt, dets


def scenario_out_of_range_det():
    """A junk large det scoring above a perfect small TP. In the small
    band the unmatched large det is IGNORED (outside the area range),
    not an FP -> AP_small stays 1.0."""
    gt = _gt_json([(1, 1, (0, 0, 10, 10), 0)])   # area 100: small
    dets = [
        _det(1, 1, (300, 300, 100, 100), 0.95),  # junk, area 10000
        _det(1, 1, (0, 0, 10, 10), 0.9),
    ]
    return gt, dets


def scenario_interp_endpoint():
    """2 GT, 1 perfect det: the recall curve ends exactly at 0.5, which
    is itself a sampled recall threshold. searchsorted(side='left')
    includes it -> 51 of 101 points read precision 1.0."""
    gt = _gt_json([
        (1, 1, (0, 0, 10, 10), 0),
        (1, 1, (50, 0, 10, 10), 0),
    ])
    dets = [_det(1, 1, (0, 0, 10, 10), 0.9)]
    return gt, dets


def scenario_monotonize():
    """FP, FP, TP: raw precision [0, 0, 1/3] must be monotonized from
    the right to [1/3, 1/3, 1/3] before sampling -> AP = 1/3."""
    return scenario_maxdets()


SCENARIOS = {
    "crowd_absorb": scenario_crowd_absorb,
    "area_bounds": scenario_area_bounds,
    "maxdets": scenario_maxdets,
    "prefer_real_gt": scenario_prefer_real_gt,
    "out_of_range_det": scenario_out_of_range_det,
    "interp_endpoint": scenario_interp_endpoint,
}


# ---------------------------------------------------------------------------
# Golden vectors (hand-computed from pycocotools' documented protocol).
# ---------------------------------------------------------------------------

def test_golden_crowd_absorb():
    m = evaluate_coco_files(*scenario_crowd_absorb())
    assert m["AP"] == 1.0
    assert m["AP50"] == 1.0
    assert m["AR100"] == 1.0
    # AR1: maxDets=1 keeps only the 0.9 det, which matches the crowd ->
    # ignored, so recall over the 1 real GT is 0.
    assert m["AR1"] == 0.0
    # AR10 re-admits the real TP
    assert m["AR10"] == 1.0


def test_golden_area_bounds_inclusive():
    m = evaluate_coco_files(*scenario_area_bounds())
    # 32^2 GT counts in BOTH small and medium; each band has its TP and
    # the other-band det matches an ignored GT (never an FP).
    assert m["AP_small"] == 1.0
    assert m["AP_medium"] == 1.0
    assert m["AP_large"] == 1.0
    assert m["AP"] == 1.0


def test_golden_maxdets_truncation():
    m = evaluate_coco_files(*scenario_maxdets())
    assert m["AR1"] == 0.0
    assert m["AR10"] == 1.0
    assert m["AR100"] == 1.0
    # fp, fp, tp at every IoU thr: monotonized precision 1/3 at all
    # sampled recalls.
    np.testing.assert_allclose(m["AP"], 1 / 3)
    np.testing.assert_allclose(m["AP50"], 1 / 3)


def test_golden_prefer_real_gt():
    m = evaluate_coco_files(*scenario_prefer_real_gt())
    # TP for IoU thr .50...90 (9 of 10); at .95 the det is unmatched
    # (crowd fallback DOES catch it there -> ignored, npig=1, recall 0,
    # no FP -> precision curve empty -> AP contribution 0).
    np.testing.assert_allclose(m["AP50"], 1.0)
    np.testing.assert_allclose(m["AP75"], 1.0)
    np.testing.assert_allclose(m["AP"], 9 / 10)


def test_golden_out_of_range_det_not_fp():
    m = evaluate_coco_files(*scenario_out_of_range_det())
    assert m["AP_small"] == 1.0
    # in the ALL band the junk det IS an in-range FP above the TP:
    # precision 1/2 at every sampled recall.
    np.testing.assert_allclose(m["AP"], 1 / 2)


def test_golden_interp_endpoint():
    m = evaluate_coco_files(*scenario_interp_endpoint())
    np.testing.assert_allclose(m["AP"], 51 / 101)
    np.testing.assert_allclose(m["AP50"], 51 / 101)
    assert m["AR100"] == 0.5


# ---------------------------------------------------------------------------
# Mutation matrix: flip one protocol rule per mutation, assert at least one
# golden scenario notices. old -> new substrings must occur exactly once.
# ---------------------------------------------------------------------------

MUTATIONS = {
    # crowd IoU uses the normal union denominator (no absorption)
    "crowd_iou_union": (
        "union = np.where(np.asarray(gt_crowd, bool)[None], darea, "
        "darea + garea - inter)",
        "union = darea + garea - inter",
    ),
    # area bounds exclusive instead of inclusive
    "area_bounds_exclusive": (
        'or not (area_rng[0] <= g["area"] <= area_rng[1])',
        'or not (area_rng[0] <= g["area"] < area_rng[1])',
    ),
    # maxDets truncation removed (all dets matched)
    "no_maxdets_truncation": (
        '[:max_dets]',
        '[:]',
    ),
    # ignored GT not sorted last (matching may prefer crowd over real)
    "no_ignored_gt_last": (
        'g_order = np.argsort(g_ignore, kind="stable")',
        'g_order = np.arange(len(g_ignore))',
    ),
    # a real-GT match may be downgraded to a higher-IoU ignored GT
    "no_downgrade_break": (
        "if best > -1 and not g_ignore[best] and g_ignore[gi]:\n"
        "                    break",
        "if False:\n"
        "                    break",
    ),
    # a matched crowd GT becomes unavailable (absorbs only one det)
    "crowd_absorbs_once": (
        'if taken[gi] and not gts[gi].get("iscrowd", 0):',
        "if taken[gi]:",
    ),
    # unmatched out-of-range dets counted as FP
    "out_of_range_det_fp": (
        "dt_ig = dt_ig | ((dt_m == -1) & d_out[None])",
        "dt_ig = dt_ig",
    ),
    # dets matched to ignored GT counted as TP
    "ignored_match_is_tp": (
        "tps = np.cumsum((dt_m > -1) & ~dt_ig, axis=1, dtype=np.float64)",
        "tps = np.cumsum((dt_m > -1), axis=1, dtype=np.float64)",
    ),
    # interpolation excludes a recall threshold hit exactly
    "interp_side_right": (
        'inds = np.searchsorted(rc, RECALL_THRS, side="left")',
        'inds = np.searchsorted(rc, RECALL_THRS, side="right")',
    ),
    # precision not monotonized from the right
    "no_monotonization": (
        "pr = np.maximum.accumulate(pr[::-1])[::-1]",
        "pr = pr",
    ),
}


def _mutated_evaluator(old: str, new: str):
    """Exec a copy of coco_eval with `old` replaced by `new` (exactly one
    occurrence required) and return its evaluate_coco_files."""
    import inspect

    src = inspect.getsource(coco_eval)
    assert src.count(old) == 1, (
        f"mutation anchor not unique/found ({src.count(old)} hits): {old!r}"
    )
    ns: dict = {}
    exec(compile(src.replace(old, new), "<mutant>", "exec"), ns)
    return ns["evaluate_coco_files"]


@pytest.mark.parametrize("name", sorted(MUTATIONS))
def test_mutation_detected(name):
    """Every protocol mutation must flip at least one golden scenario's
    metrics — proof the rule is exercised by the suite above."""
    old, new = MUTATIONS[name]
    mutant = _mutated_evaluator(old, new)
    for scen_name, build in SCENARIOS.items():
        gt, dets = build()
        base = evaluate_coco_files(gt, dets)
        got = mutant(gt, dets)
        if any(
            not np.isclose(base[k], got[k], atol=1e-12) for k in base
        ):
            return  # detected
    pytest.fail(f"mutation {name!r} survived every golden scenario")
