"""Deterministic seeding.

JAX randomness is already explicit (every draw takes a key), so unlike the
reference's global-state seeding (src/utils.py:130-142) only the host-side
NumPy generators need pinning. This module centralises both: a seeded
``numpy.random.Generator`` for ingest/split decisions and a root JAX key.
"""

from __future__ import annotations

import os
import random
from typing import Tuple

import jax
import numpy as np


def set_seed(seed: int = 0) -> Tuple[np.random.Generator, jax.Array]:
    """Returns (host generator, root JAX PRNG key) for the run; also seeds
    the legacy global RNGs so any stray library call is reproducible."""
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return np.random.default_rng(seed), jax.random.PRNGKey(seed)
