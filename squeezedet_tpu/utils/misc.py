"""Small shared utilities: metric averaging, env init, dataset registry."""

from __future__ import annotations

import numpy as np

EPSILON = 1e-10


class MetricLogger:
    """Running value/sum/count/average tracker (per-iteration metrics)."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    @property
    def avg(self) -> float:
        return self.sum / (self.count + EPSILON)

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n


def init_env(cfg) -> None:
    """Seed host-side RNG and (optionally) join a multi-host cluster.

    Device-side randomness is explicit jax.random keys derived from
    cfg.seed; there is no global device seed to set. For multi-host TPU
    pods set SQDT_COORDINATOR (+ SQDT_NUM_PROCESSES / SQDT_PROCESS_ID) and
    every host calls `jax.distributed.initialize`; the SPMD train step is
    host-count-agnostic — the mesh just spans all global devices and XLA
    routes the gradient all-reduce over ICI/DCN.
    """
    np.random.seed(cfg.seed)

    import os

    platform = os.environ.get("SQDT_PLATFORM")
    if platform:
        # run the CLI on an explicit backend (e.g. SQDT_PLATFORM=cpu with
        # XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual
        # mesh). Env vars alone cannot override this container's
        # sitecustomize-pinned 'axon' platform; jax.config.update before
        # first backend use can (tests/conftest.py does the same).
        import jax

        jax.config.update("jax_platforms", platform)

    coordinator = os.environ.get("SQDT_COORDINATOR")
    if coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ.get("SQDT_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("SQDT_PROCESS_ID", "0")),
        )


def probe_backend(timeout_s: float):
    """Backend init + one tiny execute/readback in a daemon thread.

    The single shared probe behind every init watchdog (here and
    bench.py): a wedged relay can hang the init RPC itself, or pass
    `jax.devices()` and hang the FIRST execute (both observed live
    2026-08-19) — so the probe forces device enumeration AND one tiny
    execute + D2H readback. The wedged RPC cannot be cancelled
    in-process, hence the daemon thread + timeout.

    Returns (True, n_devices) on success, (False, exception) on an init
    error, (None, None) on timeout (thread still wedged — the process
    should exit crash-only rather than try to join it).
    """
    import queue
    import threading

    out: queue.Queue = queue.Queue(maxsize=1)

    def work():
        try:
            import jax

            n = len(jax.devices())
            import jax.numpy as jnp

            jax.device_get(jnp.zeros((1,), jnp.float32) + 1.0)
            out.put((True, n))
        except BaseException as e:  # surface init errors to the caller
            out.put((False, e))

    threading.Thread(target=work, daemon=True).start()
    try:
        return out.get(timeout=timeout_s)
    except queue.Empty:
        return None, None


def guarded_backend_init(timeout_s: float = 180.0) -> None:
    """Force JAX backend initialization under a hang watchdog.

    Production failure mode (observed plus_ft300 epoch 287 resume): the
    axon relay wedges the backend-init RPC itself, so the process blocks
    inside the first `jax.devices()` BEFORE the dispatch watchdog
    (engine/device_trainer.py:_fetch_guarded) can ever arm. The probe
    (probe_backend) also catches the pass-devices-wedge-first-execute
    variant. On timeout we exit crash-only (the wedged RPC cannot be
    cancelled in-process) so the supervisor (tools/train_supervisor.py)
    relaunches with --resume. 0 disables.
    """
    if timeout_s <= 0:
        return
    import os
    import sys

    ok, result = probe_backend(timeout_s)
    if ok is None:
        print(
            f"[init-watchdog] JAX backend init stalled > {timeout_s:.0f}s "
            "— the TPU relay has likely wedged the init RPC (known axon "
            "pathology, see CLAUDE.md). Exiting crash-only so a "
            "supervisor can retry.",
            flush=True,
        )
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(14)
    if not ok:
        raise result


def load_dataset(name: str):
    if name.lower() == "kitti":
        from squeezedet_tpu.data.kitti import KITTI

        return KITTI
    if name.lower() == "coco":
        from squeezedet_tpu.data.coco import COCO

        return COCO
    raise ValueError(f"unknown dataset: {name}")
