"""Tracing/profiling utilities (SURVEY.md §5.1 rebuild).

The reference has only a ProgressMeter bar; here profiling is first-class:
`trace()` wraps a block in a jax.profiler trace (viewable in TensorBoard /
Perfetto), `StepTimer` collects per-phase wall-clock stats the way the
training drivers report loop timings.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates wall-clock per named phase; blocking on device results so
    async dispatch doesn't hide compute in the wrong bucket."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:24s} {tot:9.3f}s  x{n:<6d} {tot / max(n, 1) * 1e3:9.3f} ms/call")
        return "\n".join(lines)


def annotate(name: str):
    """Decorator adding a named TraceAnnotation around a function (shows up
    in profiler timelines)."""

    def deco(fn):
        def wrapped(*a, **k):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
