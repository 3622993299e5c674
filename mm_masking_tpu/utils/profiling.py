"""Profiling helpers: jax.profiler traces + wall-clock span timing.

The reference's only instrumentation is `time.time()` spans pushed to Neptune
(SURVEY.md §5). Here the same span timings feed the JSONL metrics stream, and
`trace()` wraps `jax.profiler` so any region can be captured for TensorBoard /
xprof (`trace_dir` → `tensorboard --logdir`).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(trace_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SpanTimer:
    """Named wall-clock spans with running means (per-sample metrics)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, n_samples: int = 1) -> Iterator[None]:
        tic = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - tic
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + n_samples

    def per_sample(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def summary(self) -> dict[str, float]:
        return {
            f"{k}_total_s": v for k, v in self.totals.items()
        } | {
            f"{k}_per_sample_s": self.per_sample(k) for k in self.totals
        }
