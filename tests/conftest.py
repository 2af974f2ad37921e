"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests
instead target 8 virtual CPU devices. The session environment registers the
TPU platform via sitecustomize before conftest runs, so plain env vars are
too late — ``jax.config.update`` still works because no backend has been
initialised yet at collection time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Tests are compile-time dominated on the single-core CI host; skipping
# XLA's optimization passes cuts wall time ~40% with identical semantics.
jax.config.update("jax_disable_most_optimizations", True)
os.environ["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"  # for CLI subprocesses

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def build_native_lib():
    """Build libfastcsv.so once per session when a toolchain exists, so the
    native ingest path is exercised by default instead of silently skipping
    (round-2 review, Missing #4)."""
    from multimodal_supernovae_tpu.data import native

    native.ensure_built()
