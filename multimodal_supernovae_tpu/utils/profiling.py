"""Profiling & step-time observability (SURVEY.md §5.1: the reference has
none; this framework treats them as first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture an XLA profiler trace (viewable in XProf/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_barrier(tree) -> None:
    """True execution barrier: fetch one scalar from the computation output.

    ``jax.block_until_ready`` is NOT a reliable barrier on tunneled backends
    (it returns before the program finishes on the axon transport), so all
    timing code synchronizes by *fetching a value* instead: transferring an
    element of the program's output to the host cannot complete before the
    program does. One scalar per call keeps the sync cost at a single
    host<->device round trip regardless of output size.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    if not leaves:
        return
    leaf = leaves[-1]
    flat = leaf if getattr(leaf, "ndim", 0) == 0 else leaf.ravel()[0]
    np.asarray(jax.device_get(flat))


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
            fetch_barrier(sync_on)
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
