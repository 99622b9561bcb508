"""Test harness: force the CPU backend with 8 virtual devices so sharding /
mesh tests run without TPU hardware (JAX's fake-multichip story).

The session's sitecustomize imports jax and pins JAX_PLATFORMS=axon before
pytest starts, so the env var is already frozen into jax.config — we must
override via jax.config.update. XLA_FLAGS is still read at CPU-client
creation, which happens later, so setting it here works.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("SQDT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
