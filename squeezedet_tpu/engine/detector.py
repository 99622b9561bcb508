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
from squeezedet_tpu.data.loader import DataLoader
from squeezedet_tpu.parallel.train import TaskSpec, make_predict_step
from squeezedet_tpu.utils.misc import MetricLogger


class Detector:
    def __init__(self, params, task: TaskSpec, cfg):
        self.task = task
        self.cfg = cfg
        self.anchors = jnp.asarray(cfg.anchors)
        if getattr(cfg, "tta_flip", False):
            from squeezedet_tpu.parallel.train import make_predict_step_tta

            self.predict = make_predict_step_tta(task)
        else:
            self.predict = make_predict_step(task)
        self.serve_uint8 = bool(getattr(cfg, "serve_uint8", True))
        self.serve_int8 = bool(getattr(cfg, "serve_int8", False))
        if getattr(cfg, "tta_flip", False) and self.serve_int8:
            raise ValueError(
                "--tta_flip is not supported with --serve_int8 (the int8 "
                "path has its own predict program); drop one of the flags"
            )
        if self.serve_uint8 and self.serve_int8:
            # int8 quantizes whitened float inputs, so it overrides the
            # (default-on) uint8 ingest rather than conflicting with it
            print("[detector] serve_int8 set: uint8 ingest disabled")
            self.serve_uint8 = False
        self.params = params
        # uint8 serving (the default path): whitening folded into the stem
        # conv; batches ship raw (4x less H2D) and cast to compute dtype on
        # device. Both param sets are kept and detect() dispatches on the
        # batch dtype, so callers that pre-whiten (demo.py) keep working.
        self._params_u8 = None
        if not self.serve_int8:
            from squeezedet_tpu.models.squeezedet import fold_whitening

            self._params_u8 = fold_whitening(params, cfg.rgb_mean, cfg.rgb_std)
        self.qparams = None  # int8: calibrated lazily on the first batch
        if self.serve_int8:
            from squeezedet_tpu.models.quant import forward_int8
            from squeezedet_tpu.ops.postprocess import postprocess

            @jax.jit
            def predict_int8(qparams, images, anchors):
                pred = forward_int8(qparams, images, task.model)
                return postprocess(
                    pred, anchors, input_size=task.input_size,
                    num_classes=task.model.num_classes, top_k=task.top_k,
                    nms_thresh=task.nms_thresh,
                    score_thresh=task.score_thresh,
                    nms_method=task.nms_method,
                    soft_nms_sigma=task.soft_nms_sigma,
                )

            self._predict_int8 = predict_int8

    def _run_predict(self, images):
        """Dispatch one batch through the active serving path."""
        if self.serve_int8:
            if images.dtype == jnp.uint8:
                # calibrating absmax on raw 0-255 pixels would silently
                # wreck every activation scale — fail loudly instead
                raise ValueError(
                    "int8 serving requires whitened float batches, got "
                    "uint8 (uint8 ingest is disabled under --serve_int8)"
                )
            if self.qparams is None:
                # absmax PTQ calibration on the first batch (models/quant.py)
                from squeezedet_tpu.models.quant import (
                    calibrate_act_scales,
                    quantize_params,
                )

                scales = calibrate_act_scales(
                    self.params, self.task.model, [images]
                )
                self.qparams = quantize_params(
                    self.params, self.task.model, scales
                )
            return self._predict_int8(self.qparams, images, self.anchors)
        if images.dtype == jnp.uint8:
            if self._params_u8 is None:
                raise ValueError("uint8 batch but folded params unavailable")
            return self.predict(self._params_u8, images, self.anchors)
        return self.predict(self.params, images, self.anchors)

    def detect(self, batch: dict[str, Any]) -> list[dict[str, Any]]:
        """Run one batch; returns one result dict per valid image, with
        boxes mapped back to original-image coordinates."""
        out = self._run_predict(jnp.asarray(batch["image"]))
        out = jax.device_get(out)

        num_valid = batch.get("num_valid", len(batch["image_metas"]))
        debug_images = batch["image"] if self.cfg.debug == 2 else None
        return [
            self._finalize(out, b, batch["image_metas"][b], debug_images)
            for b in range(num_valid)
        ]

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

    def detect_dataset(self, dataset, in_flight: int = 4) -> list[dict[str, Any]]:
        """Detect a whole dataset with a pipelined device loop: host loading
        (threaded), H2D, device predict, and D2H of previous batches all
        overlap via a bounded in-flight window."""
        import collections

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

        results: list[dict[str, Any]] = []
        window: collections.deque = collections.deque()

        def drain():
            out, metas, num_valid, images = window.popleft()
            out = jax.device_get(out)
            for b in range(num_valid):
                results.append(self._finalize(out, b, metas[b], images))

        for iter_id, batch in enumerate(loader):
            data_timer.update(time.time() - end)
            end = time.time()

            out = self._run_predict(jnp.asarray(batch["image"]))
            debug_images = batch["image"] if self.cfg.debug == 2 else None
            window.append(
                (out, batch["image_metas"], batch["num_valid"], debug_images)
            )
            if len(window) > in_flight:
                drain()

            net_timer.update(time.time() - end)
            end = time.time()
            if iter_id % self.cfg.print_interval == 0:
                print(
                    f"eval: [{iter_id}/{num_iters}] | data {data_timer.val:.3f}s"
                    f" | net {net_timer.val:.3f}s"
                )
        while window:
            drain()

        total = time.time() - start_time
        tpi = total / max(len(dataset), 1)
        print(
            f"Elapsed {total / 60.0:.2f}min ({tpi * 1000.0:.1f}ms/image,"
            f" {1 / tpi:.1f}frames/s)"
        )
        print("-" * 80)
        return results

    def _finalize(self, out, b, meta, images) -> dict[str, Any]:
        """Host-side tail per image: mask, un-map, optional visualization."""
        keep = out["keep"][b]
        result: dict[str, Any] = {"image_meta": meta}
        if keep.any():
            result.update(
                class_ids=out["class_ids"][b][keep],
                scores=out["scores"][b][keep],
                boxes=boxes_postprocess(out["boxes"][b][keep], meta),
            )
        if images is not None and "boxes" in result:
            self._visualize(images[b], result, meta)
        return result
