"""Tracing/profiling utilities (SURVEY.md §5.1 — the reference's only
observability is carriage-return print lines, simulator.py:191-245)."""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Wall-clock timer context manager."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


class ThroughputMeter:
    """Decoded-shots/s meter with running totals."""

    def __init__(self):
        self.shots = 0
        self.seconds = 0.0

    def add(self, shots: int, seconds: float):
        self.shots += shots
        self.seconds += seconds

    @property
    def shots_per_s(self) -> float:
        return self.shots / self.seconds if self.seconds else float("nan")


@contextlib.contextmanager
def trace_context(name: str, trace_dir: str | None = None):
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(name):
            yield
