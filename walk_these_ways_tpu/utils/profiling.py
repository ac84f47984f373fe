"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock splits (SURVEY.md §5;
reference ppo_cse/__init__.py:136,186-206).  Here: a jax.profiler trace
context manager (XLA/TPU timeline into TensorBoard format) and a simple
phase timer used by the runner.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wtw_trace"):
    """Capture an XLA device trace: view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase (host-side)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        return {k: dict(total_s=v, mean_ms=1e3 * v / max(self.counts[k], 1))
                for k, v in self.totals.items()}
