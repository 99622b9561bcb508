"""Tracing/profiling helpers.

The reference's observability is wall-clock timers only
(src/engine/trainer.py:28,39, src/engine/detector.py:60-83); we keep that
surface (MetricLogger timers) and add structured device profiling:
`jax.profiler` traces viewable in TensorBoard/Perfetto, enabled with
``--profile_dir``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def maybe_trace(profile_dir: str | None):
    """Capture a jax.profiler trace into ``profile_dir`` if set."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
