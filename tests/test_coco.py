"""COCO pipeline: the pycocotools-free evaluator twin against
hand-computed and independently-computed APs, the dataset reader, and a
synthetic mini-COCO train -> eval end-to-end slice (exceeding the
reference's all-`pass` stub, src/datasets/coco.py:4-41)."""

import json
import os

import numpy as np
import pytest

from squeezedet_tpu.utils.coco_eval import (
    IOU_THRS,
    RECALL_THRS,
    evaluate_coco_files,
)


def _gt_json(images, annotations, categories=(1, 2)):
    return {
        "images": [{"id": i, "file_name": f"{i:06d}.png", "width": 160,
                    "height": 96} for i in images],
        "annotations": [
            dict(
                id=k, image_id=a[0], category_id=a[1],
                bbox=list(map(float, a[2])),
                area=float(a[2][2] * a[2][3]), iscrowd=a[3] if len(a) > 3 else 0,
            )
            for k, a in enumerate(annotations)
        ],
        "categories": [{"id": c, "name": f"cat{c}"} for c in categories],
    }


def _det(image_id, cat, bbox, score):
    return {"image_id": image_id, "category_id": cat,
            "bbox": list(map(float, bbox)), "score": float(score)}


def test_eval_perfect_detection():
    gt = _gt_json([1], [(1, 1, (10, 10, 40, 40))])
    m = evaluate_coco_files(gt, [_det(1, 1, (10, 10, 40, 40), 0.9)])
    assert m["AP"] == 1.0 and m["AP50"] == 1.0 and m["AP75"] == 1.0
    assert m["AR100"] == 1.0
    assert m["AP_medium"] == 1.0  # 40x40 is in the medium area band
    assert m["AP_small"] == -1.0  # no small GT -> band unpopulated


def test_eval_iou_060_matches_thresholds():
    """A det with IoU exactly 0.6 vs its GT is a TP for thresholds
    .50/.55/.60 and a pure FP above -> AP = 3/10."""
    # GT 10x10 at origin; det 10x6 fully inside: inter 60, union 100
    gt = _gt_json([1], [(1, 1, (0, 0, 10, 10))])
    m = evaluate_coco_files(gt, [_det(1, 1, (0, 0, 10, 6), 0.9)])
    assert m["AP50"] == 1.0
    np.testing.assert_allclose(m["AP"], 3 / 10)


def test_eval_fp_above_tp_halves_precision():
    """High-scoring FP above the only TP: precision at every recall point
    is 0.5 -> AP50 = 0.5."""
    gt = _gt_json([1], [(1, 1, (0, 0, 20, 20))])
    dets = [
        _det(1, 1, (60, 60, 20, 20), 0.9),  # FP
        _det(1, 1, (0, 0, 20, 20), 0.5),    # TP
    ]
    m = evaluate_coco_files(gt, dets)
    np.testing.assert_allclose(m["AP50"], 0.5)


def test_eval_crowd_absorbs_detections():
    """Detections overlapping only a crowd GT are ignored, not FPs, and
    the crowd GT never counts toward recall."""
    gt = _gt_json(
        [1],
        [(1, 1, (0, 0, 20, 20)), (1, 1, (50, 50, 40, 40), 1)],  # 2nd crowd
    )
    dets = [
        _det(1, 1, (55, 55, 20, 20), 0.95),  # inside crowd -> ignored
        _det(1, 1, (0, 0, 20, 20), 0.6),     # clean TP
    ]
    m = evaluate_coco_files(gt, dets)
    assert m["AP50"] == 1.0  # the ignored det did not poison precision


def test_eval_category_without_gt_excluded():
    gt = _gt_json([1], [(1, 1, (0, 0, 20, 20))], categories=(1, 2))
    m = evaluate_coco_files(gt, [_det(1, 1, (0, 0, 20, 20), 0.9)])
    assert m["AP"] == 1.0  # cat 2 (no GT) excluded from the mean
    assert m["AP_cat_2"] == -1.0


def _naive_ap_at_iou(gt_json, dets, thr):
    """Independent single-threshold AP: direct greedy matching per image in
    global score order + trapezoid-free 101-point interpolation, written
    without reference to the main implementation. No crowd/area handling —
    use only on fixtures where those are inactive."""
    def iou(d, g):
        dx1, dy1, dx2, dy2 = d[0], d[1], d[0] + d[2], d[1] + d[3]
        gx1, gy1, gx2, gy2 = g[0], g[1], g[0] + g[2], g[1] + g[3]
        iw = max(0.0, min(dx2, gx2) - max(dx1, gx1))
        ih = max(0.0, min(dy2, gy2) - max(dy1, gy1))
        inter = iw * ih
        u = d[2] * d[3] + g[2] * g[3] - inter
        return inter / u if u > 0 else 0.0

    cats = [c["id"] for c in gt_json["categories"]]
    aps = []
    for cat in cats:
        gts = {}
        for a in gt_json["annotations"]:
            if a["category_id"] == cat:
                gts.setdefault(a["image_id"], []).append(list(a["bbox"]))
        n_gt = sum(len(v) for v in gts.values())
        if n_gt == 0:
            continue
        cat_dets = sorted(
            (d for d in dets if d["category_id"] == cat),
            key=lambda d: -d["score"],
        )
        used = {img: [False] * len(v) for img, v in gts.items()}
        tp, fp = [], []
        for d in cat_dets:
            cands = gts.get(d["image_id"], [])
            best, best_iou = -1, thr
            for gi, g in enumerate(cands):
                v = iou(d["bbox"], g)
                if v >= best_iou and not used[d["image_id"]][gi]:
                    best, best_iou = gi, v
            if best >= 0:
                used[d["image_id"]][best] = True
                tp.append(1)
                fp.append(0)
            else:
                tp.append(0)
                fp.append(1)
        tp, fp = np.cumsum(tp), np.cumsum(fp)
        rc = tp / n_gt
        pr = tp / np.maximum(tp + fp, 1e-12)
        # right-monotone envelope then sample 101 recall points
        for i in range(len(pr) - 2, -1, -1):
            pr[i] = max(pr[i], pr[i + 1])
        samples = []
        for r in RECALL_THRS:
            idx = np.searchsorted(rc, r, side="left")
            samples.append(pr[idx] if idx < len(pr) else 0.0)
        aps.append(float(np.mean(samples)))
    return float(np.mean(aps))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eval_matches_independent_ap50_on_random_scenes(seed):
    """Random multi-image scenes (no crowd, mid-size boxes so area bands
    are inactive at 'all'): the full evaluator's AP50/AP75 must equal the
    independent naive single-threshold AP."""
    rng = np.random.RandomState(seed)
    images = list(range(1, 6))
    anns, dets = [], []
    for img in images:
        for _ in range(rng.randint(1, 5)):
            cat = int(rng.randint(1, 3))
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(33, 60, 2)  # > 32^2 keeps 'small' empty
            anns.append((img, cat, (x, y, w, h)))
            # jittered detection + random scores; some images add an FP
            if rng.rand() < 0.9:
                dx, dy = rng.uniform(-10, 10, 2)
                dets.append(
                    _det(img, cat, (x + dx, y + dy, w, h), rng.rand())
                )
        if rng.rand() < 0.5:
            dets.append(
                _det(img, int(rng.randint(1, 3)),
                     tuple(rng.uniform(0, 60, 2)) + (40.0, 40.0), rng.rand())
            )
    gt = _gt_json(images, anns)
    m = evaluate_coco_files(gt, dets)
    for key, thr in (("AP50", 0.5), ("AP75", 0.75)):
        np.testing.assert_allclose(
            m[key], _naive_ap_at_iou(gt, dets, thr), atol=1e-9,
            err_msg=f"{key} seed {seed}",
        )


# -- dataset + end-to-end --------------------------------------------------

def _make_coco_tree(root, n_images=4, size=(96, 160)):
    import cv2

    coco = os.path.join(root, "coco")
    os.makedirs(os.path.join(coco, "annotations"))
    for split in ("train", "val"):
        os.makedirs(os.path.join(coco, split), exist_ok=True)

    h, w = size
    images, annotations = [], []
    ann_id = 1
    for i in range(1, n_images + 1):
        img = np.full((h, w, 3), 30, dtype=np.uint8)
        x1, y1 = 40 + (i % 3) * 12, 8 + (i % 2) * 6
        img[y1 : y1 + 70, x1 : x1 + 30] = (250, 60, 60)
        images.append({"id": i, "file_name": f"{i:06d}.png",
                       "width": w, "height": h})
        annotations.append(
            {"id": ann_id, "image_id": i, "category_id": 1,
             "bbox": [float(x1), float(y1), 30.0, 70.0],
             "area": 2100.0, "iscrowd": 0}
        )
        ann_id += 1
        for split in ("train", "val"):
            cv2.imwrite(
                os.path.join(coco, split, f"{i:06d}.png"), img[:, :, ::-1]
            )
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person"}, {"id": 3, "name": "car"}
        ],
    }
    for split in ("train", "val"):
        with open(
            os.path.join(coco, "annotations", f"instances_{split}.json"), "w"
        ) as fp:
            json.dump(gt, fp)
    return coco


class TinyCOCO:
    """96x160-input COCO for CPU tests (mirrors tests.test_e2e.TinyKITTI)."""

    def __new__(cls, phase, cfg):
        from squeezedet_tpu.core.anchors import generate_anchors
        from squeezedet_tpu.data.coco import COCO

        ds = COCO(phase, cfg)
        ds.input_size = (96, 160)
        ds.grid_size = (6, 10)
        ds.anchors_seed = np.array(
            [[34, 30], [75, 45], [30, 70]], dtype=np.float32
        )
        ds.anchors = generate_anchors(
            ds.grid_size, ds.input_size, ds.anchors_seed
        )
        ds.anchors_per_grid = ds.anchors_seed.shape[0]
        ds.num_anchors = ds.anchors.shape[0]
        return ds


def _cfg(tmp_path, **overrides):
    from squeezedet_tpu.config import Config

    kwargs = dict(
        mode="train", dataset="coco", batch_size=2, num_epochs=2,
        val_intervals=1, save_intervals=1, num_workers=2, keep_top_k=16,
        seed=42,
    )
    kwargs.update(overrides)
    cfg = Config(**kwargs)
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.data_dir = str(tmp_path / "data")
    cfg.save_dir = str(tmp_path / "exp")
    cfg.debug_dir = str(tmp_path / "exp" / "debug")
    return cfg


def test_coco_dataset_reader(tmp_path):
    _make_coco_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path)
    ds = TinyCOCO("train", cfg)
    assert ds.num_classes == 2  # from the JSON categories, not the 80 names
    assert ds.class_names == ("person", "car")
    assert len(ds) == 4
    cls, boxes = ds.load_annotations(0)
    assert cls.tolist() == [0]  # category_id 1 -> class 0
    np.testing.assert_allclose(boxes[0], [52, 14, 82, 84])  # xywh -> xyxy
    item = ds[0]
    assert item["image"].shape == (96, 160, 3)
    assert item["gt"].shape == (ds.num_anchors, ds.num_classes + 9)


def test_coco_save_results_and_perfect_eval(tmp_path):
    """Feeding the GT back as detections through save_results -> evaluate
    must score AP = 1 (round-trips the xyxy<->xywh and category mapping)."""
    _make_coco_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path)
    ds = TinyCOCO("val", cfg)
    results = []
    for i in range(len(ds)):
        cls, boxes = ds.load_annotations(i)
        results.append(
            {
                "image_meta": {"image_id": ds.sample_ids[i]},
                "class_ids": cls.astype(np.int32),
                "scores": np.full((len(cls),), 0.9, np.float32),
                "boxes": boxes,
            }
        )
    ds.save_results(results)
    metrics = ds.evaluate()
    assert metrics["AP"] == 1.0 and metrics["mAP"] == 1.0
    assert os.path.exists(
        os.path.join(cfg.save_dir, "results", "detections_val.json")
    )


def test_coco_train_eval_cycle(tmp_path, monkeypatch):
    """End-to-end: synthetic mini-COCO -> train loop -> detector -> COCO
    detections JSON -> evaluator twin -> metrics in the log."""
    _make_coco_tree(str(tmp_path / "data"))
    cfg = _cfg(tmp_path, score_thresh=0.02)

    import squeezedet_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "load_dataset", lambda name: TinyCOCO)
    train_mod.train(cfg)

    assert os.path.isdir(os.path.join(cfg.save_dir, "model_last"))
    dets_json = os.path.join(cfg.save_dir, "results", "detections_val.json")
    assert os.path.exists(dets_json)
    logs = [d for d in os.listdir(cfg.save_dir) if d.startswith("logs_")]
    content = open(os.path.join(cfg.save_dir, logs[0], "log.txt")).read()
    assert "mAP" in content and "AP50" in content


def test_kitti_to_coco_converter(tmp_path):
    """tools/kitti_to_coco.py: KITTI tree -> COCO layout readable by the
    COCO dataset class; DontCare becomes iscrowd."""
    from tests.test_e2e import _make_kitti_tree
    from tools.kitti_to_coco import main as convert

    _make_kitti_tree(str(tmp_path / "data"))
    # add a DontCare region to the first label file
    with open(
        tmp_path / "data" / "kitti" / "training" / "label_2" / "000000.txt",
        "a",
    ) as fp:
        fp.write("DontCare -1 -1 -10 0.00 0.00 30.00 30.00 -1 -1 -1 -1000 -1000 -1000 -10\n")
    assert convert([str(tmp_path / "data"), str(tmp_path / "converted")]) == 0

    gt = json.load(
        open(tmp_path / "converted" / "coco" / "annotations" / "instances_train.json")
    )
    assert len(gt["images"]) == 4
    assert gt["images"][0]["width"] == 600 and gt["images"][0]["height"] == 200
    crowd = [a for a in gt["annotations"] if a["iscrowd"]]
    # KITTI DontCare is class-agnostic but COCO crowd matching is
    # per-category: one crowd annotation per category, so any class's
    # detections are absorbed there (mirrors the devkit)
    assert len(crowd) == 3
    assert sorted(a["category_id"] for a in crowd) == [1, 2, 3]
    assert len({a["id"] for a in gt["annotations"]}) == len(gt["annotations"])
    # 4 images x (Car + Pedestrian) + 1 DontCare x 3 categories
    assert len(gt["annotations"]) == 11

    cfg = _cfg(tmp_path)
    cfg.data_dir = str(tmp_path / "converted")
    ds = TinyCOCO("train", cfg)
    assert ds.class_names == ("Car", "Pedestrian", "Cyclist")
    cls, boxes = ds.load_annotations(0)
    assert len(cls) == 2  # DontCare (crowd) excluded from training GT
    item = ds[0]
    assert item["image"].shape == (96, 160, 3)


def test_coco_device_data_train_eval(tmp_path, monkeypatch):
    """--device_data works for COCO too: staging, HBM-resident epochs,
    device predict sweep -> detections JSON -> evaluator twin."""
    _make_coco_tree(str(tmp_path / "data"), n_images=5)
    cfg = _cfg(tmp_path, device_data=True, score_thresh=0.02)

    import squeezedet_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "load_dataset", lambda name: TinyCOCO)
    train_mod.train(cfg)

    dets_json = os.path.join(cfg.save_dir, "results", "detections_val.json")
    assert os.path.exists(dets_json)
    logs = [d for d in os.listdir(cfg.save_dir) if d.startswith("logs_")]
    content = open(os.path.join(cfg.save_dir, logs[0], "log.txt")).read()
    assert "AP50" in content and "mAP" in content
