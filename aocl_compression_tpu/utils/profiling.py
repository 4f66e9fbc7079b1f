"""Profiling hooks — the reference's tracing/stat surface (SURVEY §5.1)
mapped to JAX: handle-level stats live in api.unified (measured around
fenced device execution); this module adds the external-profiler hook the
reference lacks: jax.profiler traces viewable in TensorBoard/Perfetto.

Usage:
    from aocl_compression_tpu.utils.profiling import trace, annotate

    with trace("/tmp/jax-trace"):           # whole-region device trace
        actpu.compress(h, data)

    with annotate("lz4-encode"):            # named span inside a trace
        ...
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span (shows up in profiler timelines)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class Stopwatch:
    """Simple wall-clock section timer collecting named durations —
    the bench's best-of-N aggregation helper (codec_bench.h:130-135)."""

    def __init__(self):
        self.best = {}
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.best[name] = min(self.best.get(name, float("inf")), dt)
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in self.totals:
            lines.append(
                f"{name}: best {self.best[name] * 1e3:.2f} ms, avg "
                f"{self.totals[name] / self.counts[name] * 1e3:.2f} ms "
                f"(n={self.counts[name]})")
        return "\n".join(lines)
