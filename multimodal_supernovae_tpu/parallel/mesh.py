"""Device mesh construction.

The framework parallelises over a 2-D ``jax.sharding.Mesh``:

  * ``data`` — the batch axis. Each chip encodes B/n samples; contrastive
    embeddings are all-gathered over ICI so the CLIP logit matrix spans the
    global batch (ops/losses.py). This is the workhorse axis: the models are
    small (emb <= 256) but the contrastive objective wants the largest batch
    the pod can feed.
  * ``model`` — optional tensor parallelism for the feed-forward / projection
    matmuls (parallel/sharding.py). Defaults to 1; useful only when scaling
    the encoders well past the reference's sizes.

The reference has no parallelism of any kind (SURVEY.md §2.5); this layer is
the one genuinely new distributed component of the rebuild.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``n_data=None`` uses all remaining devices after the model axis. The
    model axis is placed innermost so its collectives ride the
    fastest/nearest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model:
        raise ValueError(f"{n} devices not divisible by model axis {n_model}")
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} exceeds {n} devices")
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])
