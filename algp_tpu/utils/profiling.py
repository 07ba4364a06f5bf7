"""Tracing / profiling hooks (SURVEY.md §5).

The reference has no tracing at all; here every hot phase can be wrapped
in a `jax.profiler` trace annotation and timed with a block-until-ready
stopwatch, so `python -m algp_tpu.cli … --profile-dir /tmp/trace` captures
a TensorBoard-loadable device trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (no-op cost when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a full profiler trace to `log_dir` (None → no-op)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Wall-clock timing that respects async dispatch: `stop(x)` blocks on
    x before reading the clock, so timings measure device work."""

    def __init__(self):
        self._t0 = None

    def start(self) -> "Stopwatch":
        self._t0 = time.perf_counter()
        return self

    def stop(self, wait_on=None) -> float:
        if wait_on is not None:
            jax.block_until_ready(wait_on)
        return time.perf_counter() - self._t0


def timed(fn, *args, warmup: int = 1, iters: int = 5, **kw):
    """(median_seconds, result) of a jitted callable, post-warm-up."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kw)
        jax.block_until_ready(result)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = fn(*args, **kw)
        jax.block_until_ready(result)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], result
