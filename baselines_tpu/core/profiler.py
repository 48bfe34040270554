"""Profiling / tracing helpers — the TPU analog of the reference's
wall-clock instrumentation (SURVEY §5.1: logger.profile_kv timers
logger.py:262-282, trpo timed() stopwatches, fps logging, commented-out TF
timeline recipe running_mean_std.py:167-182).

- `trace(logdir)`: capture a jax.profiler device trace (open in
  tensorboard / xprof) around a block of updates.
- `annotate(name)`: TraceAnnotation visible in the trace timeline.
- `device_timer`: wall-clock a jitted callable with a hard device sync,
  accounting async dispatch (block_until_ready alone can under-report
  through relayed backends).
- the KV timers (`logger.profile_kv`) remain the cheap always-on path.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(logdir: str):
    """Capture a device trace: `with profiler.trace('/tmp/tb'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_timer(fn, *args, iters: int = 10, sync_leaf=None):
    """Run fn(*args) iters times; returns seconds/iter with a hard sync.

    `sync_leaf(result)` should return one array of the result to fetch; by
    default the first leaf is used.
    """
    result = fn(*args)
    leaves = jax.tree_util.tree_leaves(result)
    pick = sync_leaf or (lambda r: jax.tree_util.tree_leaves(r)[0])
    jax.device_get(pick(result))
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
    jax.device_get(pick(result))
    return (time.perf_counter() - t0) / iters
