#!/usr/bin/env python
"""XLA scheduler-flag sweep on the real chip (VERDICT round-3 #8 stretch).

The structural b20-MFU levers (channel padding, space-to-depth, Pallas
fire) were measured and retired in rounds 2-3; the one untried cheap
angle is the XLA compiler's own scheduling knobs. This tool times the
predict step (serial-carry scan, RTT-subtracted — the honest method from
tools/mfu_probe.py) at batch 20 and 128 under a list of XLA_FLAGS
candidates, one subprocess per candidate (XLA_FLAGS is read once at
backend init, so flags cannot be swept in-process).

Run on the real chip when it is otherwise idle (the child holds the TPU
claim for ~1-2 min per candidate):

    python tools/xla_flags_sweep.py            # full sweep
    python tools/xla_flags_sweep.py --quick    # b20 only, fewer reps

Each child prints one JSON line; the parent collects them into a table
and names the winner. A child that crashes (unknown flag, relay outage)
is recorded as failed and the sweep continues. Results belong in
EVIDENCE.md either way — a measured null is a result.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANDIDATES: list[tuple[str, str]] = [
    ("baseline", ""),
    # the latency-hiding scheduler overlaps compute with async copies;
    # measure both settings (the default has changed across XLA versions)
    ("lhs_on", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("lhs_off", "--xla_tpu_enable_latency_hiding_scheduler=false"),
    # scoped vmem bounds how much VMEM the scheduler may use for
    # prefetch/double-buffering; the default is conservative
    ("vmem_48m", "--xla_tpu_scoped_vmem_limit_kib=49152"),
    ("vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    # combined best-guess
    ("lhs_on_vmem_96m",
     "--xla_tpu_enable_latency_hiding_scheduler=true "
     "--xla_tpu_scoped_vmem_limit_kib=98304"),
]


def child() -> None:
    sys.path.insert(0, REPO)
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
    out = {"xla_flags": os.environ.get("XLA_FLAGS", ""), "rtt_ms": rtt * 1e3}
    for batch in (20,) if quick else (20, 128):
        images = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, *input_size, 3)),
            jnp.float32,
        )
        ms = scan_predict_ms(
            params, images, anchors, task,
            n=20 if quick else 40, rtt=rtt, reps=1 if quick else 2,
        )
        out[f"predict_ms_b{batch}"] = round(ms, 3)
        out[f"img_per_s_b{batch}"] = round(batch / ms * 1e3, 1)
    print("SWEEP_RESULT " + json.dumps(out), flush=True)


def main() -> None:
    if "--child" in sys.argv:
        child()
        return
    quick = "--quick" in sys.argv
    results = []
    for name, flags in CANDIDATES:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
        if quick:
            cmd.append("--quick")
        print(f"[sweep] {name}: XLA_FLAGS={env['XLA_FLAGS']!r}", flush=True)
        try:
            proc = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"[sweep] {name}: TIMEOUT", flush=True)
            results.append({"name": name, "error": "timeout"})
            continue
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("SWEEP_RESULT ")), None,
        )
        if proc.returncode != 0 or line is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            print(f"[sweep] {name}: FAILED rc={proc.returncode} {tail}",
                  flush=True)
            results.append({"name": name, "error": f"rc={proc.returncode}"})
            continue
        rec = {"name": name, **json.loads(line[len("SWEEP_RESULT "):])}
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
