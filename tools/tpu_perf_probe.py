#!/usr/bin/env python
"""On-TPU perf/correctness probe: fp32 vs bf16 predict
and train steps, with per-iteration D2H readback (tunnel-safe timing).

Run from the repo root with the default (axon) backend:
    python tools/tpu_perf_probe.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.core.boxes import xywh_to_xyxy
    from squeezedet_tpu.core.matching import encode_annotations
    from squeezedet_tpu.data.kitti import KITTI_ANCHOR_SEEDS
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
    from squeezedet_tpu.parallel.train import (
        TaskSpec,
        init_train_state,
        make_predict_step,
        make_train_step,
    )

    print("devices:", jax.devices(), flush=True)
    quick = "quick" in sys.argv[1:]

    anchors_np = generate_anchors((24, 78), (384, 1248), KITTI_ANCHOR_SEEDS)
    anchors = jnp.asarray(anchors_np)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(20, 384, 1248, 3)).astype(np.float32)
    )
    gt = jnp.asarray(
        np.stack(
            [
                encode_annotations(
                    np.array([0, 1]),
                    xywh_to_xyxy(anchors_np[[100, 5000]]),
                    anchors_np,
                    3,
                )
            ]
            * 20
        )
    )

    results = {}
    # both dtypes ALWAYS run — the probe's purpose is the fp32-vs-bf16
    # comparison (incl. the score-parity check); quick mode saves time by
    # skipping the train-step timing instead
    variants = [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]

    ref_pred = None
    for name, dtype in variants:
        spec = ModelSpec(compute_dtype=dtype)
        task = TaskSpec(model=spec, input_size=(384, 1248), num_anchors=16848)
        params = init_params(jax.random.PRNGKey(0), spec)
        predict = make_predict_step(task)

        try:
            t0 = time.perf_counter()
            out = predict(params, imgs, anchors)
            keep = jax.device_get(out["scores"])
            print(f"{name}: predict compile {time.perf_counter()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"{name}: predict FAILED: {type(e).__name__}: {e}", flush=True)
            continue

        if ref_pred is None and dtype == jnp.float32:
            ref_pred = keep
        elif ref_pred is not None:
            diff = np.abs(keep - ref_pred).max()
            print(f"{name}: max |score diff| vs fp32 = {diff:.4f}", flush=True)

        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(params, imgs, anchors)
            jax.device_get(out["scores"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: predict {dt*1000:.1f} ms/batch = {20/dt:.0f} img/s",
              flush=True)
        results[name] = 20 / dt

        # train step (skipped in quick mode — its ~25 s compile dominates)
        if quick:
            continue
        try:
            step = make_train_step(task)
            state = init_train_state(params, task)
            rng = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            state, stats = step(state, imgs, gt, anchors, 0.01, rng)
            l0 = float(stats["loss"])
            print(f"{name}: train compile {time.perf_counter()-t0:.1f}s "
                  f"loss={l0:.3f}", flush=True)
            t0 = time.perf_counter()
            for _ in range(5):
                state, stats = step(state, imgs, gt, anchors, 0.01, rng)
                float(stats["loss"])
            dt = (time.perf_counter() - t0) / 5
            print(f"{name}: train {dt*1000:.1f} ms/step "
                  f"-> {dt*187:.1f} s/epoch(3740)", flush=True)
        except Exception as e:
            print(f"{name}: train FAILED: {type(e).__name__}: {e}", flush=True)

    print("summary img/s:", {k: round(v) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
