"""Tracing / profiling harness (SURVEY.md §5.1).

``trace_context`` wraps a block in a ``jax.profiler`` trace (TensorBoard /
Perfetto readable); ``timed`` is the block-until-ready wall-clock harness
the benchmarks use; ``named_scope`` re-exports jax's annotation so model
phases (render / likelihood / sampler) show up labeled in traces.
"""

from __future__ import annotations

import contextlib
import time

import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def trace_context(logdir: str = "/tmp/celeste_tpu_trace"):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 2):
    """Wall-clock a jitted callable with proper synchronization.
    Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out
