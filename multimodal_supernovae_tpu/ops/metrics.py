"""Training/eval metrics as vectorized, jit-able functions.

The reference computes its pairwise retrieval "AUC" with an O(B^2) Python
loop over torch argsorts (src/utils.py:380-426). Here the same quantity is a
single rank computation on the similarity matrix — one MXU matmul plus
elementwise compares — so it can run on-device at the end of every
validation epoch without leaving HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def retrieval_rank_fractions(
    embs1: jax.Array, embs2: jax.Array, n_thresholds: int = 100
):
    """Fraction of correct retrievals under a top-fraction threshold sweep.

    Reference semantics (src/utils.py:380-411): for each item ``i`` of
    modality 2, rank all modality-1 embeddings by cosine similarity
    (descending); the retrieval at threshold ``theta`` counts as correct when
    the true match sits within the top ``int(theta * N)`` ranks; thresholds
    sweep ``linspace(0, 1, n_thresholds)``.

    The rank of the true match equals the number of competitors with a
    STRICTLY larger similarity (ties resolve optimistically; for continuous
    embeddings ties have measure zero).

    Returns (thresholds, fraction_correct), both (n_thresholds,).
    """
    embs1 = embs1 / jnp.linalg.norm(embs1, axis=-1, keepdims=True)
    embs2 = embs2 / jnp.linalg.norm(embs2, axis=-1, keepdims=True)
    sims = embs2 @ embs1.T  # (N2, N1): row i = sims of embs1 vs embs2[i]
    n1 = embs1.shape[0]
    diag = jnp.diagonal(sims)  # similarity of the true match
    ranks = jnp.sum(sims > diag[:, None], axis=1)  # (N2,)
    thresholds = jnp.linspace(0.0, 1.0, n_thresholds)
    cutoffs = jnp.floor(thresholds * n1).astype(jnp.int32)  # int(theta * N)
    correct = ranks[:, None] < cutoffs[None, :]  # (N2, n_thresholds)
    return thresholds, correct.mean(axis=0)


def retrieval_auc(embs1: jax.Array, embs2: jax.Array, n_thresholds: int = 100):
    """Trapezoid-integrated area under the threshold/fraction-correct curve
    (``get_AUC``, src/utils.py:414-426). 1.0 = perfect, 0.5 = random."""
    thresholds, frac = retrieval_rank_fractions(embs1, embs2, n_thresholds)
    return jnp.trapezoid(frac, thresholds)


def retrieval_at_k(embs1: jax.Array, embs2: jax.Array, k: int = 1):
    """Top-k retrieval accuracy (retrieval@1 is the north-star fidelity
    metric in BASELINE.json)."""
    embs1 = embs1 / jnp.linalg.norm(embs1, axis=-1, keepdims=True)
    embs2 = embs2 / jnp.linalg.norm(embs2, axis=-1, keepdims=True)
    sims = embs2 @ embs1.T
    diag = jnp.diagonal(sims)
    ranks = jnp.sum(sims > diag[:, None], axis=1)
    return (ranks < k).mean()


def r2_score(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Coefficient of determination, as logged per epoch by the reference
    (src/models_multimodal.py:374-390)."""
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true)) ** 2)
    return 1.0 - ss_res / ss_tot


def _confusion_counts(y_true, y_pred, n_classes: int):
    """Per-class (tp, fp, fn) from integer label arrays."""
    classes = jnp.arange(n_classes)
    t = y_true[None, :] == classes[:, None]  # (C, N)
    p = y_pred[None, :] == classes[:, None]
    tp = jnp.sum(t & p, axis=1).astype(jnp.float32)
    fp = jnp.sum(~t & p, axis=1).astype(jnp.float32)
    fn = jnp.sum(t & ~p, axis=1).astype(jnp.float32)
    return tp, fp, fn


def macro_f1(y_true: jax.Array, y_pred: jax.Array, n_classes: int) -> jax.Array:
    """Macro-averaged F1 matching ``MulticlassFBetaScore(beta=1)`` with its
    default macro averaging (src/models_multimodal.py:403), including the
    convention that absent classes (tp=fp=fn=0) contribute F1=0."""
    tp, fp, fn = _confusion_counts(y_true, y_pred, n_classes)
    denom = 2 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1.0), 0.0)
    return f1.mean()


def micro_f1(y_true: jax.Array, y_pred: jax.Array, n_classes: int) -> jax.Array:
    tp, fp, fn = _confusion_counts(y_true, y_pred, n_classes)
    return 2 * tp.sum() / jnp.maximum(2 * tp.sum() + fp.sum() + fn.sum(), 1.0)


def regression_metrics(y_true: jax.Array, y_pred: jax.Array):
    """L1 / L2(RMSE) / R2 / outlier fraction, as in ``calculate_metrics``
    (src/utils.py:880-911). OLF counts ``|dz| / (1 + z_true) > 0.15``."""
    delta = y_true - y_pred
    return {
        "L1": jnp.mean(jnp.abs(delta)),
        "L2": jnp.sqrt(jnp.mean(delta**2)),
        "R2": r2_score(y_true, y_pred),
        "OLF": jnp.mean((jnp.abs(delta) / (1.0 + y_true) > 0.15).astype(jnp.float32)),
    }
