#!/usr/bin/env python
"""Headline benchmark: KITTI-resolution inference throughput per TPU chip.

Measures the full serving path per iteration — host batch -> device (H2D),
jitted backbone + ConvDet + on-device decode/top-K/NMS, and D2H readback of
the fixed-shape detections — at 1248x384, batch 20, matching the
reference's headline config (117 img/s on a V100 with 8 loader threads,
README.md:38-42). Every iteration materializes the detections on the host,
so async-dispatch artifacts can't inflate the number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 117.0  # reference V100 throughput
BATCH = 20
INPUT_SIZE = (384, 1248)
WARMUP = 3
ITERS = 15


def main() -> None:
    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.data.kitti import KITTI_ANCHOR_SEEDS
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
    from squeezedet_tpu.parallel.train import (
        TaskSpec,
        init_train_state,
        make_predict_step,
        make_train_step,
    )

    use_bf16 = os.environ.get("SQDT_BENCH_FP32") != "1"
    spec = ModelSpec(
        num_classes=3,
        anchors_per_grid=9,
        compute_dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
    )
    task = TaskSpec(model=spec, input_size=INPUT_SIZE, num_anchors=16848)
    params = init_params(jax.random.PRNGKey(0), spec)
    anchors = jnp.asarray(
        generate_anchors((24, 78), INPUT_SIZE, KITTI_ANCHOR_SEEDS)
    )
    predict = make_predict_step(task)

    host_batch = np.random.default_rng(0).normal(
        size=(BATCH, *INPUT_SIZE, 3)
    ).astype(np.float32)

    def run_once():
        images = jax.device_put(host_batch)  # H2D each iteration
        out = predict(params, images, anchors)
        # D2H readback forces completion through the remote tunnel
        return jax.device_get(
            (out["keep"], out["scores"], out["boxes"], out["class_ids"])
        )

    for _ in range(WARMUP):
        run_once()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        run_once()
    elapsed = time.perf_counter() - t0
    fps = ITERS * BATCH / elapsed

    # secondary: train step time (batch 20) vs 36 s/epoch (3,740 imgs) on V100
    from squeezedet_tpu.core.matching import encode_annotations
    from squeezedet_tpu.core.boxes import xywh_to_xyxy

    anchors_np = np.asarray(anchors)
    gt = np.stack(
        [
            encode_annotations(
                np.array([0, 1]),
                xywh_to_xyxy(anchors_np[[100, 5000]]),
                anchors_np,
                3,
            )
        ]
        * BATCH
    )
    step = make_train_step(task)
    state = init_train_state(params, task)
    rng = jax.random.PRNGKey(1)
    gt_j = jnp.asarray(gt)

    def train_once(state):
        images = jax.device_put(host_batch)
        state, stats = step(state, images, gt_j, anchors, 0.01, rng)
        float(stats["loss"])  # force completion
        return state

    state = train_once(state)  # compile
    t0 = time.perf_counter()
    for _ in range(8):
        state = train_once(state)
    train_s_per_step = (time.perf_counter() - t0) / 8
    epoch_s = train_s_per_step * (3740 // BATCH)  # KITTI train split size

    print(
        json.dumps(
            {
                "metric": "kitti_1248x384_batch20_infer_throughput_per_chip",
                "value": round(fps, 1),
                "unit": "img/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
                "compute_dtype": "bf16" if use_bf16 else "fp32",
                "train_s_per_step_b20": round(train_s_per_step, 4),
                "train_s_per_epoch_3740imgs": round(epoch_s, 1),
                "baseline_epoch_s_v100": 36.0,
            }
        )
    )


if __name__ == "__main__":
    main()
