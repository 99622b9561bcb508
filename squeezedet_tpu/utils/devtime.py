"""Honest device-step timing through the axon tunnel.

One dispatch runs N iterations of the predict step in a ``lax.scan``
whose carry creates a serial data dependency (a score-derived ~0 scalar
added to every weight), so XLA cannot hoist or overlap iterations. Wall
time of the dispatch (with a scalar readback) minus the separately
measured tunnel RTT, divided by N, is the device step time — immune to
the ~28 ms/call axon dispatch cost that dominates naive timing.

This is THE implementation of the method: bench.py and
tools/mfu_probe.py both import from here so the harness and the peak
constant cannot drift between them.
"""

from __future__ import annotations

import time

PEAK_BF16 = 197e12  # TPU v5e per-chip bf16 peak FLOP/s


def measure_rtt(n: int = 20) -> float:
    """Round-trip seconds for a trivial dispatch + scalar readback."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        float(trivial(jnp.float32(0.0)))
    return (time.perf_counter() - t0) / n


def scan_predict_ms(params, images, anchors, task, *, n: int = 40,
                    rtt: float | None = None, reps: int = 2,
                    compiler_options: dict | None = None) -> float:
    """Device milliseconds per predict step via the serial-carry scan.

    ``compiler_options`` (e.g. ``{"xla_tpu_enable_latency_hiding_scheduler":
    "true"}``) is forwarded to the explicit lower/compile path — the ONLY
    way to reach the remote TPU compiler's flags through the axon relay:
    the local jaxlib has no TPU flag registry, so ``XLA_FLAGS`` env
    candidates abort client-side at parse (measured round 5, see
    tools/xla_flags_sweep.py). Options are validated server-side (a bogus
    name fails the remote compile), so an accepted option is an honored
    one."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from squeezedet_tpu.parallel.train import _predict_batch

    if rtt is None:
        rtt = measure_rtt()

    def run_n(p, imgs):
        def body(carry, _):
            pc = jax.tree.map(lambda w: w + carry, p)
            out = _predict_batch(pc, imgs, anchors, task)
            # scores >= 0 in practice, so adding min(scores, 0) * 1e-30 to
            # the weights is a no-op the compiler cannot prove away —
            # forces serial iterations
            dep = jnp.minimum(jnp.min(out["scores"]), 0.0) * 1e-30
            return dep, ()

        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    if compiler_options is None:
        fn = jax.jit(run_n)
    else:
        fn = (jax.jit(run_n)
              .lower(params, images)
              .compile(compiler_options=dict(compiler_options)))
    float(fn(params, images))  # compile / warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(params, images))
        best = min(best, time.perf_counter() - t0)
    return (best - rtt) / n * 1e3
