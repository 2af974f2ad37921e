"""Contrastive losses (CLIP softmax / SigLIP sigmoid) and their
global-batch-sharded variants.

Single-device semantics follow the reference exactly (src/loss.py):

  * ``clip_loss``: symmetric InfoNCE over the pairwise logit matrix
    ``exp(logit_scale) * (e2 @ e1.T) + logit_bias``, mean of row- and
    column-wise ``-log softmax`` diagonals (src/loss.py:14-38).
  * ``sigmoid_loss``: SigLIP (arXiv 2303.15343) with labels ``2I - 1`` and
    logits ``-(e2 @ e1.T) * exp(logit_scale) + logit_bias``
    (src/loss.py:68-83). The reference casts logits to float64 before the
    log-sigmoid; on TPU we instead use the numerically-stable
    ``jax.nn.log_sigmoid`` in float32, which is what the float64 cast was
    compensating for.
  * multimodal wrappers sum the pair loss over all C(n, 2) modality pairs
    with broadcast or per-pair scale/bias (src/loss.py:41-65, :86-107).

Sharded variants: the contrastive objective couples the whole global batch
(every pair of samples forms a logit). Under a data-parallel mesh each chip
holds B/n embeddings; ``all_gather_embeddings`` pulls the full embedding sets
over ICI (embeddings are tiny: B x enc_dim), after which every chip computes
the identical full-batch loss — so gradients need no extra reduction beyond
the psum the surrounding ``shard_map``/pjit already performs. Negatives thus
scale with chip count, matching the north-star design (no reference
counterpart exists: the reference is single-device, SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def clip_loss(
    embs1: jax.Array,
    embs2: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
) -> jax.Array:
    """Symmetric InfoNCE between two L2-normalized embedding sets.

    ``logit_scale`` is stored as a log (the model learns log-scale,
    src/models_multimodal.py:164-166) and exponentiated here, as in
    src/loss.py:22.
    """
    scale = jnp.exp(logit_scale)
    logits = embs2 @ embs1.T * scale + logit_bias
    # row-wise (over modality-1 candidates) and column-wise log-softmax diags
    rows = jax.nn.log_softmax(logits, axis=1)
    cols = jax.nn.log_softmax(logits, axis=0)
    diag_r = jnp.diagonal(rows)
    diag_c = jnp.diagonal(cols)
    n = min(embs1.shape[0], embs2.shape[0])
    return -(diag_r.sum() / n + diag_c.sum() / n) / 2.0


def sigmoid_loss(
    embs1: jax.Array,
    embs2: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
) -> jax.Array:
    """SigLIP pairwise sigmoid loss (src/loss.py:68-83)."""
    scale = jnp.exp(logit_scale)
    bs = embs2.shape[0]
    labels = 2.0 * jnp.eye(bs, dtype=embs2.dtype) - 1.0
    logits = -(embs2 @ embs1.T) * scale + logit_bias
    # -mean log sigma(-labels * logits), computed stably.
    return -jnp.mean(jax.nn.log_sigmoid(-labels * logits))


def _pairwise(
    loss_fn,
    embeddings: Sequence[jax.Array],
    logit_scales: jax.Array,
    logit_biases: jax.Array,
) -> jax.Array:
    """Sum a pair loss over all C(n,2) modality pairs.

    Scalar (0-d) scale/bias broadcast to every pair; 1-d arrays provide one
    value per pair in (i, j) lexicographic order (src/loss.py:49-63).
    """
    n = len(embeddings)
    n_pairs = n * (n - 1) // 2
    scales = jnp.broadcast_to(jnp.atleast_1d(logit_scales), (n_pairs,))
    biases = jnp.broadcast_to(jnp.atleast_1d(logit_biases), (n_pairs,))
    total = 0.0
    count = 0
    for i in range(n - 1):
        for j in range(i + 1, n):
            total = total + loss_fn(
                embeddings[i], embeddings[j], scales[count], biases[count]
            )
            count += 1
    return total


def clip_loss_multimodal(embeddings, logit_scales, logit_biases) -> jax.Array:
    return _pairwise(clip_loss, embeddings, logit_scales, logit_biases)


def sigmoid_loss_multimodal(embeddings, logit_scales, logit_biases) -> jax.Array:
    return _pairwise(sigmoid_loss, embeddings, logit_scales, logit_biases)


# ---------------------------------------------------------------------------
# Sharded (global-batch) variants
# ---------------------------------------------------------------------------


def all_gather_embeddings(
    embeddings: Sequence[jax.Array], axis_name: str
) -> List[jax.Array]:
    """All-gather per-chip embedding shards into full global-batch arrays.

    Must run inside a ``shard_map``/``pmap`` context over ``axis_name``. The
    gather rides ICI; each array is (B_local, D) -> (B_global, D) with the
    global batch in device order, so positive pairs stay on the diagonal.
    """
    return [
        jax.lax.all_gather(e, axis_name, axis=0, tiled=True) for e in embeddings
    ]


def clip_loss_multimodal_sharded(
    embeddings, logit_scales, logit_biases, axis_name: str
) -> jax.Array:
    """Global-batch CLIP loss from per-chip embedding shards."""
    gathered = all_gather_embeddings(embeddings, axis_name)
    return clip_loss_multimodal(gathered, logit_scales, logit_biases)


def sigmoid_loss_multimodal_sharded(
    embeddings, logit_scales, logit_biases, axis_name: str
) -> jax.Array:
    gathered = all_gather_embeddings(embeddings, axis_name)
    return sigmoid_loss_multimodal(gathered, logit_scales, logit_biases)


def weighted_cross_entropy(
    logits: jax.Array, labels: jax.Array, class_weights: Optional[jax.Array]
) -> jax.Array:
    """torch ``nn.CrossEntropyLoss(weight=w)`` semantics: the per-sample
    losses are weighted by the true-class weight and normalised by the SUM of
    the applied weights (not the sample count)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if class_weights is None:
        return nll.mean()
    w = class_weights[labels.astype(jnp.int32)]
    return (nll * w).sum() / w.sum()


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)
