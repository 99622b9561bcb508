"""Demo driver: detect the bundled KITTI sample images and render boxes.

Like the reference (src/demo.py:17-52) this borrows the KITTI preprocessing
without needing the dataset on disk, runs per-image detection, and writes
visualizations. Differences: images are found under
``<data_dir>/samples/kitti/testing/image_2`` (falling back to the reference
mount's bundled samples), results are saved rather than shown in a window
(headless), and the checkpoint comes from --load_model (.pth or orbax).
"""

from __future__ import annotations

import glob
import os

import jax
import numpy as np

from squeezedet_tpu.data.imageio import read_image
from squeezedet_tpu.data.kitti import (
    KITTI_ANCHOR_SEEDS,
    KITTI_CLASS_NAMES,
    KITTI_INPUT_SIZE,
    KITTI_RGB_MEAN,
    KITTI_RGB_STD,
)
from squeezedet_tpu.core.anchors import generate_anchors
from squeezedet_tpu.core.image import resize, whiten
from squeezedet_tpu.engine.detector import Detector
from squeezedet_tpu.models.squeezedet import init_params
from squeezedet_tpu.utils.checkpoint import load_any

REFERENCE_SAMPLES = "/root/reference/data/samples/kitti/testing/image_2"


def _sample_paths(cfg) -> list[str]:
    for root in (
        os.path.join(cfg.data_dir, "samples/kitti/testing/image_2"),
        REFERENCE_SAMPLES,
    ):
        paths = sorted(glob.glob(os.path.join(root, "*.png")))
        if paths:
            return paths
    raise FileNotFoundError("no sample images found for demo")


def demo(cfg) -> list[dict]:
    # KITTI preprocessing constants without requiring the dataset on disk
    cfg.input_size = KITTI_INPUT_SIZE
    cfg.rgb_mean, cfg.rgb_std = KITTI_RGB_MEAN, KITTI_RGB_STD
    cfg.class_names = KITTI_CLASS_NAMES
    cfg.num_classes = len(KITTI_CLASS_NAMES)
    grid = tuple(x // 16 for x in KITTI_INPUT_SIZE)
    cfg.anchors = generate_anchors(grid, KITTI_INPUT_SIZE, KITTI_ANCHOR_SEEDS)
    cfg.anchors_per_grid = KITTI_ANCHOR_SEEDS.shape[0]
    cfg.num_anchors = cfg.anchors.shape[0]
    if cfg.debug == 0:
        cfg.debug = 2  # demo always renders detections

    from squeezedet_tpu.train import build_task

    task = build_task(cfg)
    params = init_params(jax.random.PRNGKey(cfg.seed), task.model)
    if cfg.load_model:
        params, _ = load_any(cfg.load_model, params, task.model)
    else:
        print("[demo] no --load_model given: running with random weights")

    detector = Detector(params, task, cfg)
    all_results = []
    for path in _sample_paths(cfg):
        image = read_image(path)
        image_meta = {
            "image_id": os.path.basename(path)[:-4],
            "orig_size": np.array(image.shape, dtype=np.int32),
        }
        image, image_meta = whiten(image, image_meta, cfg.rgb_mean, cfg.rgb_std)
        image, image_meta, _ = resize(image, image_meta, cfg.input_size)

        batch = {
            "image": image[None].astype(np.float32),
            "image_metas": [image_meta],
            "num_valid": 1,
        }
        results = detector.detect(batch)
        n = len(results[0].get("boxes", ()))
        print(f"[demo] {image_meta['image_id']}: {n} detections")
        all_results.extend(results)
    return all_results
