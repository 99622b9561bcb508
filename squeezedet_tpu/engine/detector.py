"""Inference engine: batched on-device detection + host-side un-mapping.

The reference runs decode on device but top-K/NMS/threshold per image in
Python (src/engine/detector.py:20-122). Here the whole filter chain runs
inside the jitted predict step (ops/postprocess.py); the host only slices
the fixed-shape ``(B, K)`` outputs by the keep mask and inverts the image
preprocessing into original coordinates.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.core.boxes import boxes_postprocess, visualize_boxes
from squeezedet_tpu.core.image import image_postprocess
from squeezedet_tpu.data.loader import DataLoader, prefetch_to_device
from squeezedet_tpu.parallel.train import TaskSpec, make_predict_step
from squeezedet_tpu.utils.misc import MetricLogger


class Detector:
    def __init__(self, params, task: TaskSpec, cfg):
        self.task = task
        self.cfg = cfg
        self.anchors = jnp.asarray(cfg.anchors)
        self.predict = make_predict_step(task)
        self.serve_uint8 = bool(getattr(cfg, "serve_uint8", False))
        if self.serve_uint8:
            # uint8 serving: whitening folded into the stem conv; batches
            # ship raw (4x less H2D) and are cast to compute dtype on device
            from squeezedet_tpu.models.squeezedet import fold_whitening

            params = fold_whitening(params, cfg.rgb_mean, cfg.rgb_std)
        self.params = params

    def detect(self, batch: dict[str, Any]) -> list[dict[str, Any]]:
        """Run one batch; returns one result dict per valid image, with
        boxes mapped back to original-image coordinates."""
        out = self.predict(self.params, jnp.asarray(batch["image"]), self.anchors)
        out = jax.device_get(out)

        num_valid = batch.get("num_valid", len(batch["image_metas"]))
        results = []
        for b in range(num_valid):
            meta = batch["image_metas"][b]
            keep = out["keep"][b]
            result: dict[str, Any] = {"image_meta": meta}
            if keep.any():
                boxes = out["boxes"][b][keep]
                result.update(
                    class_ids=out["class_ids"][b][keep],
                    scores=out["scores"][b][keep],
                    boxes=boxes_postprocess(boxes, meta),
                )
            results.append(result)

            if self.cfg.debug == 2 and "boxes" in result:
                self._visualize(batch["image"][b], result, meta)
        return results

    def _visualize(self, image_nhwc, result, meta):
        image = image_postprocess(np.asarray(image_nhwc), meta)
        save_path = os.path.join(self.cfg.debug_dir, str(meta["image_id"]) + ".png")
        visualize_boxes(
            image,
            result["class_ids"],
            result["boxes"],
            result["scores"],
            class_names=self.cfg.class_names,
            save_path=save_path,
        )

    def detect_dataset(self, dataset) -> list[dict[str, Any]]:
        start_time = time.time()
        loader = DataLoader(
            dataset,
            batch_size=self.cfg.batch_size,
            num_workers=self.cfg.num_workers,
            inference=True,
            pad_last=True,  # static batch shape: no recompiles on remainder
            raw_uint8=self.serve_uint8,
        )
        num_iters = len(loader)
        data_timer, net_timer = MetricLogger(), MetricLogger()
        end = time.time()

        results = []
        for iter_id, batch in enumerate(loader):
            data_timer.update(time.time() - end)
            end = time.time()

            results.extend(self.detect(batch))

            net_timer.update(time.time() - end)
            end = time.time()
            if iter_id % self.cfg.print_interval == 0:
                print(
                    f"eval: [{iter_id}/{num_iters}] | data {data_timer.val:.3f}s"
                    f" | net {net_timer.val:.3f}s"
                )

        total = time.time() - start_time
        tpi = total / max(len(dataset), 1)
        print(
            f"Elapsed {total / 60.0:.2f}min ({tpi * 1000.0:.1f}ms/image,"
            f" {1 / tpi:.1f}frames/s)"
        )
        print("-" * 80)
        return results
