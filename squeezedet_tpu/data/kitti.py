"""KITTI 2D detection dataset.

Constants and file-format conventions follow the reference
(src/datasets/kitti.py:11-126): fixed 384x1248 input, 3 classes, dataset RGB
stats, 9 k-means seed anchors on a stride-16 grid (24x78 cells -> 16,848
anchors), `image_sets/{train,val,trainval}.txt` id lists, `label_2` txt
annotations, devkit-format result files, and evaluation via the native C++
AP evaluator (ours lives at native/kitti_eval/, same CLI contract).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.data.base import BaseDataset

KITTI_INPUT_SIZE = (384, 1248)
KITTI_CLASS_NAMES = ("Car", "Pedestrian", "Cyclist")
KITTI_RGB_MEAN = np.array([93.877, 98.801, 95.923], dtype=np.float32).reshape(1, 1, 3)
KITTI_RGB_STD = np.array([78.782, 80.130, 81.200], dtype=np.float32).reshape(1, 1, 3)
KITTI_ANCHOR_SEEDS = np.array(
    [
        [34, 30], [75, 45], [38, 90],
        [127, 68], [80, 174], [196, 97],
        [194, 178], [283, 156], [381, 185],
    ],
    dtype=np.float32,
)


class KITTI(BaseDataset):
    def __init__(self, phase: str, cfg):
        super().__init__(phase, cfg)

        self.input_size = KITTI_INPUT_SIZE
        self.class_names = KITTI_CLASS_NAMES
        self.rgb_mean = KITTI_RGB_MEAN
        self.rgb_std = KITTI_RGB_STD
        self.num_classes = len(self.class_names)
        self.class_ids_dict = {n: i for i, n in enumerate(self.class_names)}

        self.data_dir = os.path.join(cfg.data_dir, "kitti")
        self.sample_ids, self.sample_set_path = self.get_sample_ids()

        self.grid_size = tuple(x // 16 for x in self.input_size)
        self.anchors_seed = self.load_anchor_seeds(cfg, KITTI_ANCHOR_SEEDS)
        self.anchors = generate_anchors(self.grid_size, self.input_size, self.anchors_seed)
        self.anchors_per_grid = self.anchors_seed.shape[0]
        self.num_anchors = self.anchors.shape[0]

        self.results_dir = os.path.join(cfg.save_dir, "results")
        # decoded-image RAM cache (uint8): with a single-digit-GB dataset
        # and a slow host core, skipping repeat PNG decode is the
        # difference between host-bound and device-bound epochs
        self._image_cache: dict[int, np.ndarray] | None = (
            {} if getattr(cfg, "cache_images", False) else None
        )

    def get_sample_ids(self):
        set_names = {"train": "train.txt", "val": "val.txt", "trainval": "trainval.txt"}
        sample_set_path = os.path.join(
            self.data_dir, "image_sets", set_names[self.phase]
        )
        with open(sample_set_path) as fp:
            sample_ids = tuple(line.strip() for line in fp if line.strip())
        return sample_ids, sample_set_path

    def _image_source(self, index: int):
        """PNG path + id for the shared decode-once cache (base.py)."""
        image_id = self.sample_ids[index]
        path = os.path.join(self.data_dir, "training/image_2", image_id + ".png")
        return path, image_id

    def load_annotations(self, index: int):
        ann_id = self.sample_ids[index]
        path = os.path.join(self.data_dir, "training/label_2", ann_id + ".txt")
        class_ids, boxes = [], []
        with open(path) as fp:
            for line in fp:
                fields = line.strip().split(" ")
                if fields and fields[0] in self.class_ids_dict:
                    class_ids.append(self.class_ids_dict[fields[0]])
                    boxes.append([float(v) for v in fields[4:8]])
        return (
            np.array(class_ids, dtype=np.int16),
            np.array(boxes, dtype=np.float32).reshape(-1, 4),
        )

    # -- evaluation --------------------------------------------------------
    def save_results(self, results):
        """Write per-image KITTI-format detection txt files
        ('cls -1 -1 0 x1 y1 x2 y2 0 0 0 0 0 0 0 score')."""
        txt_dir = os.path.join(self.results_dir, "data")
        os.makedirs(txt_dir, exist_ok=True)

        for res in results:
            txt_path = os.path.join(
                txt_dir, str(res["image_meta"]["image_id"]) + ".txt"
            )
            with open(txt_path, "w") as fp:
                if "class_ids" not in res:
                    continue
                for i in range(len(res["class_ids"])):
                    name = self.class_names[int(res["class_ids"][i])].lower()
                    b = res["boxes"][i]
                    fp.write(
                        f"{name} -1 -1 0 {b[0]:.2f} {b[1]:.2f} {b[2]:.2f} {b[3]:.2f}"
                        f" 0 0 0 0 0 0 0 {res['scores'][i]:.3f}\n"
                    )

    def evaluate(self) -> dict[str, float]:
        """Run the native AP evaluator and parse per-class/difficulty APs."""
        from squeezedet_tpu.utils.kitti_eval import (
            parse_aps,
            plot_pr_curves,
            run_kitti_eval,
        )

        run_kitti_eval(
            gt_dir=os.path.join(self.data_dir, "training"),
            image_set_path=self.sample_set_path,
            results_dir=self.results_dir,
            num_images=len(self.sample_ids),
        )
        plot_pr_curves(self.results_dir)
        return parse_aps(self.results_dir, self.class_names)
