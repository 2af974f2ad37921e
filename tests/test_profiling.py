"""Regression tests for the Throughput meter's execution barrier.

Round-1 bug (VERDICT.md weak #6): the meter synced with
``jax.block_until_ready``, which is a no-op on the tunneled axon backend, so
TPU timings silently measured only dispatch. The fix syncs by fetching a
value (a true barrier on every backend). These tests pin that the meter
measures a computation's *execution* time, not just its dispatch time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_supernovae_tpu.utils.profiling import Throughput, fetch_barrier


def _slow_program(x):
    def body(c, _):
        return jnp.tanh(c @ c), None

    out, _ = jax.lax.scan(body, x, None, length=30)
    return out


def test_meter_measures_execution_not_dispatch():
    f = jax.jit(_slow_program)
    x = jnp.eye(512) + 0.01
    fetch_barrier(f(x))  # compile + warm up

    # Reference execution time, measured with an explicit value fetch.
    t0 = time.perf_counter()
    fetch_barrier(f(x * 1.0001))
    t_exec = time.perf_counter() - t0

    # Meter with sync must include the execution.
    meter = Throughput(warmup=0)
    meter.start()
    dt = meter.stop(sync_on=f(x * 1.0002))

    assert dt > 0
    # The scanned 512x512 matmul chain takes milliseconds; if the barrier
    # regressed to a no-op, dt would collapse to the ~microsecond dispatch.
    # (Comparing against a fraction of t_exec, not a multiple of dispatch
    # time: host-side dispatch wall time is noisy on a loaded 1-core CI.)
    assert dt >= max(0.3 * t_exec, 1e-3), (dt, t_exec)
    assert meter.summary(items_per_call=10)["items_per_s"] == pytest.approx(
        10 / dt, rel=1e-6
    )


def test_fetch_barrier_handles_trees_and_scalars():
    fetch_barrier(None)
    fetch_barrier([])
    fetch_barrier({"a": jnp.float32(1.0), "b": [jnp.zeros((3, 4)), "str"]})
    fetch_barrier(jnp.arange(5))


def test_meter_warmup_discard():
    meter = Throughput(warmup=2)
    for _ in range(5):
        meter.start()
        meter.stop()
    assert meter.summary()["calls"] == 3
