"""Profiler integration: capture XLA traces around solver phases.

The reference's only profiling story is `@profile` in experiment scripts
(test/butterfly.jl:3,75-76).  Here: a context manager around any solver
call writes a TensorBoard-loadable XLA trace, plus a lightweight
annotation helper for marking driver phases inside traces.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str = "/tmp/feast_tpu_trace", create_perfetto: bool = False):
    """Capture a jax.profiler trace around a block:

        with tracing.trace("/tmp/tr"):
            ft.feast(A, X0, ...)
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=create_perfetto)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (device + host timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
