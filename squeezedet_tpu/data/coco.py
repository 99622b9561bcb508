"""COCO dataset scaffold.

The reference ships COCO as a stub with class names only and unimplemented
template methods (src/datasets/coco.py:4-41). We mirror that surface — the
80 class names plus anchor-grid defaults for a 768x768 input — so the
registry and config plumbing work, and raise cleanly on methods that need
the (absent) COCO data to be meaningful.
"""

from __future__ import annotations

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


class COCO(BaseDataset):
    def __init__(self, phase: str, cfg):
        super().__init__(phase, cfg)
        self.input_size = (768, 768)
        self.class_names = COCO_CLASS_NAMES
        self.rgb_mean = COCO_RGB_MEAN
        self.rgb_std = COCO_RGB_STD
        self.num_classes = len(self.class_names)

        self.data_dir = os.path.join(cfg.data_dir, "coco")
        self.grid_size = tuple(x // 16 for x in self.input_size)
        # generic multi-scale seeds pending a dataset-specific k-means run
        # (tools/compute_dataset_seed_anchors.py)
        s = np.array(
            [[24, 24], [48, 48], [96, 96], [192, 192], [384, 384],
             [48, 96], [96, 48], [96, 192], [192, 96]],
            dtype=np.float32,
        )
        self.anchors_seed = s
        self.anchors = generate_anchors(self.grid_size, self.input_size, s)
        self.anchors_per_grid = s.shape[0]
        self.num_anchors = self.anchors.shape[0]
        self.sample_ids = ()

    def get_sample_ids(self):
        raise NotImplementedError("COCO data pipeline not wired up yet")

    def load_image(self, index: int):
        raise NotImplementedError("COCO data pipeline not wired up yet")

    def load_annotations(self, index: int):
        raise NotImplementedError("COCO data pipeline not wired up yet")

    def save_results(self, results):
        raise NotImplementedError("COCO data pipeline not wired up yet")

    def evaluate(self):
        raise NotImplementedError("COCO data pipeline not wired up yet")
