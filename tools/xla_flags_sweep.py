#!/usr/bin/env python
"""XLA TPU scheduler-option sweep on the real chip (VERDICT round-3 #8).

Measured round 5: sweeping via ``XLA_FLAGS`` env is STRUCTURALLY
IMPOSSIBLE through the axon relay — compilation happens server-side and
the local jaxlib (CPU + axon plugin, no libtpu) has no TPU flag
registry, so any ``--xla_tpu_*`` candidate aborts the client at flag
parse (``parse_flags_from_env.cc: Unknown flag``). The working channel
is JAX's per-compile ``compiler_options`` (``jit(f).lower(...).compile(
compiler_options={...})``), which rides the remote-compile RPC and is
validated server-side: a bogus option name fails the remote compile
(verified), so an accepted option is an honored one.

That also simplifies the harness: options are per-executable, not
process-global, so ALL candidates sweep in ONE process — one backend
init, one guarded claim, N explicit compiles timed by the serial-carry
scan method from utils/devtime.py (RTT-subtracted, readback-forced).

Run on the real chip when it is otherwise idle:

    python tools/xla_flags_sweep.py            # full sweep (b20 + b128)
    python tools/xla_flags_sweep.py --quick    # b20 only, fewer reps

A candidate whose compile fails server-side (unknown/invalid option for
the server's XLA version) is recorded as failed and the sweep continues.
Results belong in EVIDENCE.md either way — a measured null is a result.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANDIDATES: list[tuple[str, dict[str, str]]] = [
    ("baseline", {}),
    # the latency-hiding scheduler overlaps compute with async copies;
    # measure both settings (the default has changed across XLA versions)
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    # scoped vmem bounds how much VMEM the scheduler may use for
    # prefetch/double-buffering; the default is conservative
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # aggressive fusion profitability search
    ("fusion_heavy", {"xla_tpu_rwb_fusion": "true"}),
    # combined best-guess
    ("lhs_on_vmem_96m", {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "98304",
    }),
]


def main() -> None:
    import numpy as np

    from squeezedet_tpu.utils.cache import enable_compilation_cache
    from squeezedet_tpu.utils.devtime import measure_rtt, scan_predict_ms
    from squeezedet_tpu.utils.misc import guarded_backend_init

    platform = os.environ.get("SQDT_PLATFORM")
    if platform:  # CPU smoke-testing, same override the CLI honors
        import jax

        jax.config.update("jax_platforms", platform)
    guarded_backend_init(timeout_s=120.0)  # rc=14 on a wedged relay
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.core.anchors import generate_anchors
    from squeezedet_tpu.data.kitti import KITTI_ANCHOR_SEEDS
    from squeezedet_tpu.models.squeezedet import ModelSpec, init_params
    from squeezedet_tpu.parallel.train import TaskSpec

    quick = "--quick" in sys.argv
    input_size = (384, 1248)
    anchors = jnp.asarray(
        generate_anchors((24, 78), input_size, KITTI_ANCHOR_SEEDS)
    )
    task = TaskSpec(
        model=ModelSpec(compute_dtype=jnp.bfloat16),
        input_size=input_size,
        num_anchors=int(anchors.shape[0]),
    )
    params = init_params(jax.random.PRNGKey(0), task.model)
    rtt = measure_rtt()
    print(f"[sweep] rtt {rtt * 1e3:.1f} ms", flush=True)

    batches = (20,) if quick else (20, 128)
    images = {
        b: jnp.asarray(
            np.random.default_rng(0).normal(size=(b, *input_size, 3)),
            jnp.float32,
        )
        for b in batches
    }

    results = []
    for name, options in CANDIDATES:
        rec: dict = {"name": name, "options": options}
        try:
            for b in batches:
                ms = scan_predict_ms(
                    params, images[b], anchors, task,
                    n=20 if quick else 40, rtt=rtt,
                    reps=1 if quick else 2,
                    # baseline uses the plain jit path (identical to
                    # production); explicit {} would also work
                    compiler_options=options or None,
                )
                rec[f"predict_ms_b{b}"] = round(ms, 3)
                rec[f"img_per_s_b{b}"] = round(b / ms * 1e3, 1)
        except Exception as e:  # server-side compile rejection, outage
            rec["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        results.append(rec)
        print(f"[sweep] {name}: {rec}", flush=True)

    ok = [r for r in results if "error" not in r]
    if ok:
        key = "predict_ms_b20"
        best = min(ok, key=lambda r: r[key])
        base = next((r for r in ok if r["name"] == "baseline"), None)
        print("\nname                 b20 ms    b128 ms")
        for r in ok:
            print(f"{r['name']:<20} {r.get('predict_ms_b20', float('nan')):>7.3f}"
                  f"   {r.get('predict_ms_b128', float('nan')):>7.3f}")
        if base:
            gain = (base[key] - best[key]) / base[key] * 100
            print(f"\nbest: {best['name']} ({best[key]:.3f} ms b20, "
                  f"{gain:+.1f}% vs baseline)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
