#!/usr/bin/env python
"""MFU probe: device-step time + MFU for the conv stack, and the measured
effect of exact zero-channel-padding (VERDICT round-2 #2).

Method: one dispatch runs N iterations of the predict (or train) step in a
`lax.scan` whose carry creates a serial data dependency (predict: a
score-derived ~0 scalar is added to every weight; train: the optimizer
state), so XLA cannot hoist or overlap iterations. Wall time of the
dispatch (with a scalar readback) minus the separately-measured tunnel RTT,
divided by N, is the honest device step time — immune to the ~28 ms/call
axon dispatch cost that dominates naive timing.

MFU = analytic conv FLOPs of the BASE arch (models/squeezedet.arch_flops —
padded variants do extra zero work that must not inflate the metric)
divided by device time x v5e bf16 peak (197 TFLOP/s).

Run on the real chip:  python tools/mfu_probe.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from squeezedet_tpu.utils.devtime import (  # shared with bench.py
    PEAK_BF16,
    measure_rtt,
    scan_predict_ms,
)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.core.boxes import xywh_to_xyxy
    from squeezedet_tpu.core.matching import encode_annotations
    from squeezedet_tpu.data.kitti import KITTI_ANCHOR_SEEDS
    from squeezedet_tpu.models.squeezedet import (
        ModelSpec,
        arch_flops,
        init_params,
        pad_params_to_arch,
        register_padded_arch,
    )
    from squeezedet_tpu.parallel.train import (
        TaskSpec,
        _sgd_step,
        init_train_state,
        make_optimizer,
    )
    from squeezedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    quick = "quick" in sys.argv[1:]
    N = 20 if quick else 50
    input_size = (384, 1248)
    anchors_np = generate_anchors((24, 78), input_size, KITTI_ANCHOR_SEEDS)
    anchors = jnp.asarray(anchors_np)
    print("devices:", jax.devices(), flush=True)

    # tunnel RTT: a trivial dispatch with readback (shared harness)
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)

    def time_predict(params, task, batch, label, base_flops):
        imgs = jnp.asarray(
            np.random.default_rng(0)
            .normal(size=(batch, *input_size, 3))
            .astype(np.float32)
        )
        step_ms = scan_predict_ms(
            params, imgs, anchors, task, n=N, rtt=rtt, reps=3
        )
        mfu = base_flops / ((step_ms / 1e3) * PEAK_BF16)
        print(
            f"{label:<34s} b{batch:<4d} {step_ms:7.2f} ms/batch  "
            f"{batch / (step_ms / 1e3):8.1f} img/s  MFU {mfu*100:5.1f}%",
            flush=True,
        )
        return step_ms

    def time_train(params, task, batch, label, base_flops):
        imgs = jnp.asarray(
            np.random.default_rng(1)
            .normal(size=(batch, *input_size, 3))
            .astype(np.float32)
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
                * batch
            )
        )
        tx = make_optimizer(task)
        state = init_train_state(params, task)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def run_n(state, images, gt):
            def body(st, _):
                st, stats = _sgd_step(
                    st, images, gt, anchors, 0.01, key, task, tx, None
                )
                return st, stats["loss"]

            st, losses = lax.scan(body, state, None, length=N)
            return st, losses[-1]

        st, l = run_n(state, imgs, gt)
        float(l)  # compile
        t0 = time.perf_counter()
        st, l = run_n(st, imgs, gt)
        float(l)
        step_ms = (time.perf_counter() - t0 - rtt) / N * 1e3
        # fwd + bwd ~= 3x forward FLOPs
        mfu = 3 * base_flops / ((step_ms / 1e3) * PEAK_BF16)
        print(
            f"{label:<34s} b{batch:<4d} {step_ms:7.2f} ms/step   "
            f"(~{3*base_flops/1e9:.0f} GFLOP) MFU {mfu*100:5.1f}%",
            flush=True,
        )
        return step_ms

    for arch in ["squeezedet"] + ([] if quick else ["squeezedetplus"]):
        spec = ModelSpec(
            arch=arch, num_classes=3, anchors_per_grid=9,
            dropout_prob=0.0, compute_dtype=jnp.bfloat16,
        )
        task = TaskSpec(model=spec, input_size=input_size, num_anchors=16848)
        params = init_params(jax.random.PRNGKey(0), spec)
        base_flops = arch_flops(spec, input_size, 20)
        print(f"\n=== {arch}: base conv FLOPs {base_flops/1e9:.1f} GFLOP @ b20 ===")
        time_predict(params, task, 20, f"{arch} bf16", base_flops)

        # exact channel-padded variants (zero weights in the new lanes)
        for r in (32, 64, 128):
            name = register_padded_arch(arch, r)
            pspec = ModelSpec(
                arch=name, num_classes=3, anchors_per_grid=9,
                dropout_prob=0.0, compute_dtype=jnp.bfloat16,
            )
            ptask = TaskSpec(
                model=pspec, input_size=input_size, num_anchors=16848
            )
            pparams = pad_params_to_arch(params, arch, name)
            time_predict(pparams, ptask, 20, f"{arch} pad{r}", base_flops)

        # batch scaling of the base arch (device ceiling per batch size)
        if not quick:
            for b in (64, 128, 256):
                time_predict(
                    params, task, b, f"{arch} bf16", arch_flops(spec, input_size, b)
                )

        # train step (batch 20) base vs best padded
        time_train(params, task, 20, f"{arch} train bf16", base_flops)
        # train-step batch scaling (the training device ceiling — same
        # amortization of per-op overhead the predict scaling shows)
        if not quick:
            for b in (64, 128):
                time_train(
                    params, task, b, f"{arch} train bf16",
                    arch_flops(spec, input_size, b),
                )
        if not quick:
            name = register_padded_arch(arch, 64)
            pspec = ModelSpec(
                arch=name, num_classes=3, anchors_per_grid=9,
                dropout_prob=0.0, compute_dtype=jnp.bfloat16,
            )
            ptask = TaskSpec(model=pspec, input_size=input_size, num_anchors=16848)
            time_train(
                pad_params_to_arch(params, arch, name), ptask, 20,
                f"{arch} train pad64", base_flops,
            )


if __name__ == "__main__":
    main()
