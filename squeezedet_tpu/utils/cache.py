"""Persistent XLA compilation cache.

Compiles through this environment's remote-compile tunnel cost seconds to
minutes; caching serialized executables on disk makes every process after
the first start instantly. Call before the first jit execution.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get("SQDT_JAX_CACHE", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"[cache] compilation cache disabled: {e}")
