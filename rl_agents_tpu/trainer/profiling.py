"""Tracing and per-phase timing.

The reference's only timing is the episode/fps scalar and FTQ's phase
counters (SURVEY §5; reference: evaluation.py:145-159, fitted_q/abstract.py:17-19).
This module adds first-class instrumentation: per-phase wall timers feeding
the metrics writer, and jax.profiler trace capture for XLA-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path


class PhaseTimer:
    """Accumulates wall time per named phase; writes mean durations."""

    def __init__(self, writer=None):
        self.writer = writer
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def flush(self, step: int):
        if self.writer is None:
            return
        for name in self.totals:
            self.writer.add_scalar(f"time/{name}_mean_s", self.mean(name), step)
            self.writer.add_scalar(f"time/{name}_total_s", self.totals[name], step)


@contextlib.contextmanager
def trace(directory: str | Path):
    """Capture a jax.profiler trace (view with TensorBoard's profile plugin
    or Perfetto)."""
    import jax

    directory = str(directory)
    Path(directory).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(directory)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device memory statistics (the reference regexes nvidia-smi,
    common/utils.py:70-107; TPUs/JAX expose this directly)."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                stats[str(d)] = {"bytes_in_use": s.get("bytes_in_use"),
                                 "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                                 "bytes_limit": s.get("bytes_limit")}
        except Exception:
            pass
    return stats
