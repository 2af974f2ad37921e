"""Profiling & step-time observability (SURVEY.md §5.1: the reference has
none; this framework treats them as first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture an XLA profiler trace (viewable in XProf/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Wall-clock throughput meter with warmup discard and device sync."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.samples: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.samples.append(dt)
        return dt

    def summary(self, items_per_call: int = 1) -> Dict[str, float]:
        if not self.samples:
            return {}
        mean = sum(self.samples) / len(self.samples)
        return {
            "mean_s": mean,
            "min_s": min(self.samples),
            "items_per_s": items_per_call / mean,
            "calls": len(self.samples),
        }
