"""COCO detection AP evaluator — a pycocotools-free, dependency-light twin.

The reference ships COCO as an empty stub (src/datasets/coco.py:4-41); this
module goes beyond it with a working evaluator implementing the standard
COCOeval bbox protocol so `main.py eval --dataset coco` produces the usual
12-metric suite:

    AP @[.50:.95] (the headline), AP50, AP75, AP small/medium/large,
    AR @1/@10/@100, AR small/medium/large

Semantics follow pycocotools' cocoeval.py exactly where it matters:

- IoU vs a crowd GT is intersection / det area (crowd regions can absorb
  any number of detections without penalty);
- per image+category, detections are matched greedily in score order to
  the not-yet-matched GT with the highest IoU above the threshold; a
  detection may fall back onto an *ignored* GT only after every real GT
  is exhausted (ignored matches don't count as TP or FP);
- GT outside the area range (or marked iscrowd) is ignored; unmatched
  detections outside the area range are ignored rather than counted FP;
- precision is monotonized from the right and sampled at 101 recall
  points [0:.01:1]; AP averages over the 10 IoU thresholds .50:.05:.95
  and over categories present in the ground truth.

Parity is asserted against an independent brute-force reimplementation on
random scenes plus hand-computed cases (tests/test_coco.py).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_matrix(det_boxes, gt_boxes, gt_crowd):
    """(D, G) IoU; crowd GT uses intersection / det-area (pycocotools
    `iou` with iscrowd). Boxes are xywh (COCO convention)."""
    d = np.asarray(det_boxes, np.float64).reshape(-1, 4)
    g = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    dx1, dy1 = d[:, 0], d[:, 1]
    dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    gx1, gy1 = g[:, 0], g[:, 1]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    iw = np.clip(
        np.minimum(dx2[:, None], gx2[None]) - np.maximum(dx1[:, None], gx1[None]),
        0.0, None,
    )
    ih = np.clip(
        np.minimum(dy2[:, None], gy2[None]) - np.maximum(dy1[:, None], gy1[None]),
        0.0, None,
    )
    inter = iw * ih
    darea = (d[:, 2] * d[:, 3])[:, None]
    garea = (g[:, 2] * g[:, 3])[None]
    union = np.where(np.asarray(gt_crowd, bool)[None], darea, darea + garea - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image(dets, gts, iou_thrs, area_rng, max_dets, ious_full=None):
    """Greedy per-image/category matching (cocoeval.evaluateImg).

    ``dets``: list of {bbox, score}; ``gts``: list of {bbox, iscrowd, area}.
    ``ious_full``: optional precomputed (D, G) IoU matrix in the ORIGINAL
    det/gt order (computed once per image+category and reused across area
    ranges / maxDets, like pycocotools' computeIoU).
    Returns (dt_matched, dt_ignored, dt_scores, n_gt_counted) where the
    first two are (T, D) over the IoU thresholds.
    """
    g_ignore = np.array(
        [
            bool(g.get("iscrowd", 0))
            # pycocotools bounds are INCLUSIVE on both ends (an area of
            # exactly 32^2 counts for both the small and medium bands)
            or not (area_rng[0] <= g["area"] <= area_rng[1])
            for g in gts
        ],
        bool,
    )
    # ignored GT last, stable (matching prefers real GT at equal IoU)
    g_order = np.argsort(g_ignore, kind="stable")
    gts = [gts[i] for i in g_order]
    g_ignore = g_ignore[g_order]

    d_order = np.argsort([-d["score"] for d in dets], kind="stable")[:max_dets]
    dets = [dets[i] for i in d_order]
    scores = np.array([d["score"] for d in dets], np.float64)

    if ious_full is None:
        ious = _iou_matrix(
            [d["bbox"] for d in dets],
            [g["bbox"] for g in gts],
            [g.get("iscrowd", 0) for g in gts],
        )
    else:
        ious = ious_full[np.ix_(d_order, g_order)] if len(dets) and len(gts) \
            else np.zeros((len(dets), len(gts)))

    T, D, G = len(iou_thrs), len(dets), len(gts)
    dt_m = np.full((T, D), -1, np.int64)
    dt_ig = np.zeros((T, D), bool)
    for ti, t in enumerate(iou_thrs):
        taken = np.zeros(G, bool)
        for di in range(D):
            best, best_iou = -1, min(t, 1.0 - 1e-10)
            for gi in range(G):
                if taken[gi] and not gts[gi].get("iscrowd", 0):
                    continue
                # once matched to a real GT, never downgrade to ignored
                if best > -1 and not g_ignore[best] and g_ignore[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best, best_iou = gi, ious[di, gi]
            if best > -1:
                taken[best] = True
                dt_m[ti, di] = best
                dt_ig[ti, di] = g_ignore[best]
    # unmatched detections outside the area range are ignored, not FP
    d_out = np.array(
        [
            not (area_rng[0] <= d["bbox"][2] * d["bbox"][3] <= area_rng[1])
            for d in dets
        ],
        bool,
    )
    dt_ig = dt_ig | ((dt_m == -1) & d_out[None])
    return dt_m, dt_ig, scores, int((~g_ignore).sum())


def evaluate_detections(gt_by_img_cat, det_by_img_cat, categories,
                        image_ids) -> dict[str, float]:
    """Run the full COCOeval accumulation.

    ``gt_by_img_cat`` / ``det_by_img_cat``: dict[(image_id, cat_id)] ->
    list of annotation dicts (GT: bbox/area/iscrowd; det: bbox/score).
    Returns the 12 standard metrics plus per-category ``AP_<cat>``.
    """
    T, R = len(IOU_THRS), len(RECALL_THRS)
    # only the combinations the 12-metric suite reads (pycocotools computes
    # all |areas| x |maxDets| products; 6 of its 12 are never summarized)
    combos = [("all", md) for md in MAX_DETS] + [
        (a, 100) for a in ("small", "medium", "large")
    ]
    precision = {c: -np.ones((T, R, len(categories))) for c in combos}
    recall = {c: -np.ones((T, len(categories))) for c in combos}

    for ki, cat in enumerate(categories):
        # IoU computed ONCE per (image, cat), reused across areas/maxDets
        iou_cache = {
            img: _iou_matrix(
                [d["bbox"] for d in det_by_img_cat.get((img, cat), [])],
                [g["bbox"] for g in gt_by_img_cat.get((img, cat), [])],
                [
                    g.get("iscrowd", 0)
                    for g in gt_by_img_cat.get((img, cat), [])
                ],
            )
            for img in image_ids
        }
        for area_name, md in combos:
            area_rng = AREA_RNGS[area_name]
            per_img = [
                _match_image(
                    det_by_img_cat.get((img, cat), []),
                    gt_by_img_cat.get((img, cat), []),
                    IOU_THRS, area_rng, md,
                    ious_full=iou_cache[img],
                )
                for img in image_ids
            ]
            npig = sum(p[3] for p in per_img)
            if npig == 0:
                continue
            scores = np.concatenate([p[2] for p in per_img])
            order = np.argsort(-scores, kind="mergesort")
            dt_m = np.concatenate([p[0] for p in per_img], axis=1)[:, order]
            dt_ig = np.concatenate([p[1] for p in per_img], axis=1)[:, order]

            tps = np.cumsum((dt_m > -1) & ~dt_ig, axis=1, dtype=np.float64)
            fps = np.cumsum((dt_m == -1) & ~dt_ig, axis=1, dtype=np.float64)
            for ti in range(T):
                tp, fp = tps[ti], fps[ti]
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, 1e-12)
                recall[(area_name, md)][ti, ki] = rc[-1] if len(rc) else 0.0
                # monotone from the right, then sample at 101 recalls
                pr = np.maximum.accumulate(pr[::-1])[::-1]
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(R)
                valid = inds < len(pr)
                q[valid] = pr[inds[valid]]
                precision[(area_name, md)][ti, :, ki] = q

    def _ap(area, md, t_idx=None):
        p = precision[(area, md)]
        if t_idx is not None:
            p = p[t_idx : t_idx + 1]
        p = p[p > -1]
        return float(np.mean(p)) if p.size else -1.0

    def _ar(area, md):
        r = recall[(area, md)]
        r = r[r > -1]
        return float(np.mean(r)) if r.size else -1.0

    t50 = int(np.argmin(np.abs(IOU_THRS - 0.5)))
    t75 = int(np.argmin(np.abs(IOU_THRS - 0.75)))
    metrics = {
        "AP": _ap("all", 100),
        "AP50": _ap("all", 100, t50),
        "AP75": _ap("all", 100, t75),
        "AP_small": _ap("small", 100),
        "AP_medium": _ap("medium", 100),
        "AP_large": _ap("large", 100),
        "AR1": _ar("all", 1),
        "AR10": _ar("all", 10),
        "AR100": _ar("all", 100),
        "AR_small": _ar("small", 100),
        "AR_medium": _ar("medium", 100),
        "AR_large": _ar("large", 100),
    }
    for ki, cat in enumerate(categories):
        p = precision[("all", 100)][:, :, ki]
        p = p[p > -1]
        metrics[f"AP_cat_{cat}"] = float(np.mean(p)) if p.size else -1.0
    return metrics


def evaluate_coco_files(gt_json: dict, detections: list[dict]) -> dict[str, float]:
    """Evaluate a COCO-format detections list against a loaded COCO GT dict
    (the `instances_*.json` structure: images / annotations / categories)."""
    image_ids = [img["id"] for img in gt_json["images"]]
    categories = [c["id"] for c in gt_json["categories"]]
    gt_by, det_by = {}, {}
    for ann in gt_json["annotations"]:
        bbox = [float(v) for v in ann["bbox"]]
        gt_by.setdefault((ann["image_id"], ann["category_id"]), []).append(
            {
                "bbox": bbox,
                "area": float(ann.get("area", bbox[2] * bbox[3])),
                "iscrowd": int(ann.get("iscrowd", 0)),
            }
        )
    img_set = set(image_ids)
    for det in detections:
        if det["image_id"] not in img_set:
            continue
        det_by.setdefault((det["image_id"], det["category_id"]), []).append(
            {"bbox": [float(v) for v in det["bbox"]], "score": float(det["score"])}
        )
    return evaluate_detections(gt_by, det_by, categories, image_ids)
