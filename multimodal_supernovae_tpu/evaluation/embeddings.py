"""Embedding extraction over a whole dataset.

The rebuild of ``get_embs`` (src/utils.py:275-377): run the frozen model
over every sample and return per-modality L2-normalized embeddings in
canonical order. Here it is ONE jitted scan over a fixed-shape index plan on
the device-resident dataset — no DataLoader, no per-batch host sync.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import ArrayDataset, Batch, epoch_indices


def get_embeddings(
    model,
    variables: Dict,
    ds: ArrayDataset,
    batch_size: int = 256,
    return_numpy: bool = True,
) -> Tuple[List[np.ndarray], List[str]]:
    """Per-modality embeddings for every sample of ``ds``.

    Returns (embeddings list, modality names in canonical order).
    """
    data = ds.to_device()
    n = len(ds)
    plan = jnp.asarray(
        epoch_indices(n, min(batch_size, n), shuffle=False, pad="repeat_last")
    )

    @jax.jit
    def scan_embed(variables, plan):
        def body(_, idx):
            embs = model.apply(variables, data.take(idx), method=model.encode)
            return None, embs

        _, stacked = jax.lax.scan(body, None, plan)
        return stacked

    stacked = scan_embed(variables, plan)
    out = [np.asarray(e.reshape(-1, e.shape[-1]))[:n] for e in stacked]
    names = [m for m in ("host_galaxy", "lightcurve", "spectral", "meta")
             if m in model.cfg.combinations]
    if not return_numpy:
        out = [jnp.asarray(e) for e in out]
    return out, names


def masked_reconstruction_mse(
    model,
    variables: Dict,
    ds: ArrayDataset,
    key,
    batch_size: int = 256,
) -> np.ndarray:
    """Per-sample MSE of a MaskedLightCurveEncoder's reconstruction over a
    seeded random hidden span — an anomaly score for serving
    (scripts/infer.py). One jitted scan, fixed shapes."""
    data = ds.to_device()
    n = len(ds)
    plan = jnp.asarray(
        epoch_indices(n, min(batch_size, n), shuffle=False, pad="repeat_last")
    )

    @jax.jit
    def scan_mse(variables, plan, key):
        def body(key, idx):
            key, sub = jax.random.split(key)
            b = data.take(idx)
            truth, pred, pmask = model.apply(
                variables, b.x_lc, b.t_lc, b.mask_lc, sub,
                method=model.masked_pred,
            )
            w = pmask.astype(pred.dtype)
            err = ((pred - truth) ** 2 * w).sum(axis=-1)
            return key, err / jnp.maximum(w.sum(axis=-1), 1)

        _, mse = jax.lax.scan(body, key, plan)
        return mse

    return np.asarray(scan_mse(variables, plan, key)).reshape(-1)[:n]


def predict_supervised(
    model,
    variables: Dict,
    ds: ArrayDataset,
    batch_size: int = 256,
) -> np.ndarray:
    """Head predictions for a regression/classification model over ``ds``
    (the eval path of ``process_data_loader``, src/utils.py:608-691)."""
    data = ds.to_device()
    n = len(ds)
    plan = jnp.asarray(
        epoch_indices(n, min(batch_size, n), shuffle=False, pad="repeat_last")
    )

    @jax.jit
    def scan_pred(variables, plan):
        def body(_, idx):
            return None, model.apply(variables, data.take(idx))

        _, stacked = jax.lax.scan(body, None, plan)
        return stacked

    stacked = scan_pred(variables, plan)
    return np.asarray(stacked.reshape(-1, stacked.shape[-1]))[:n]
