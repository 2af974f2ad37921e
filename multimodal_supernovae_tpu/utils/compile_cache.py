"""Persistent XLA compilation cache for the CLIs.

The reference pays a fresh XLA compile per process: every sweep grid
point, every ``supervise.py`` restart, and every re-entry into a resumed
run recompiles the same programs (the ensemble stack's cold compile was
measured at 232 s, single-run train steps at ~20-40 s through the remote
TPU tunnel — benchmarks/PERF.md). JAX ships a persistent on-disk cache of
serialized XLA executables keyed by (HLO, compile options, backend
version); enabling it makes every repeat compile a disk read.

Enabled by default in all CLIs (they call :func:`enable_compilation_cache`
right after platform selection, before the first backend-initialising jax
call). Controls:

- ``MMSN_COMPILE_CACHE=0`` disables it entirely.
- ``MMSN_COMPILE_CACHE_DIR=<path>`` overrides the default location
  (``$XDG_CACHE_HOME/multimodal_supernovae_tpu/xla`` or
  ``~/.cache/multimodal_supernovae_tpu/xla``).

The cache is shared across runs on purpose: grid points that differ only
in non-compiled hyperparameters (fold number, seed, data split) produce
identical HLO and hit the same entry. If the backend cannot serialize
executables (some PJRT plugins), jax logs a warning per compile and the
run proceeds uncached — enabling is always safe.
"""

from __future__ import annotations

import os
from typing import Optional


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "multimodal_supernovae_tpu", "xla")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when disabled
    (``MMSN_COMPILE_CACHE=0``) or unavailable. Must run before the first
    compile to cover it (later compiles are still cached).
    """
    if os.environ.get("MMSN_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("MMSN_COMPILE_CACHE_DIR")
                 or default_cache_dir())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every executable regardless of size; keep jax's default
        # min-compile-time gate (1 s) so trivial jits don't churn the disk
        # — every compile this package cares about is well past it.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError) as e:  # unwritable dir / old jax
        import logging

        logging.getLogger(__name__).warning(
            "persistent compilation cache unavailable (%s); continuing "
            "without it", e)
        return None
    return cache_dir
