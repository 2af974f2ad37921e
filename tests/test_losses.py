import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_supernovae_tpu.ops.losses import (
    clip_loss,
    clip_loss_multimodal,
    mse_loss,
    sigmoid_loss,
    sigmoid_loss_multimodal,
    weighted_cross_entropy,
)


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def numpy_clip_loss(e1, e2, log_scale, bias):
    logits = e2 @ e1.T * np.exp(log_scale) + bias

    def log_softmax(a, axis):
        a = a - a.max(axis=axis, keepdims=True)
        return a - np.log(np.exp(a).sum(axis=axis, keepdims=True))

    n = min(len(e1), len(e2))
    rows = -np.diag(log_softmax(logits, 1)).sum() / n
    cols = -np.diag(log_softmax(logits, 0)).sum() / n
    return (rows + cols) / 2


def numpy_sigmoid_loss(e1, e2, log_scale, bias):
    bs = e2.shape[0]
    labels = 2 * np.eye(bs) - 1
    logits = -(e2 @ e1.T) * np.exp(log_scale) + bias
    return -np.mean(np.log(1.0 / (1.0 + np.exp(labels * logits))))


def test_clip_loss_matches_numpy(rng):
    e1 = _normalize(rng.normal(size=(8, 16))).astype(np.float32)
    e2 = _normalize(rng.normal(size=(8, 16))).astype(np.float32)
    got = clip_loss(jnp.array(e1), jnp.array(e2), jnp.float32(2.3), jnp.float32(-1.0))
    want = numpy_clip_loss(e1, e2, 2.3, -1.0)
    assert float(got) == pytest.approx(want, rel=1e-5)


def test_sigmoid_loss_matches_numpy(rng):
    e1 = _normalize(rng.normal(size=(6, 8))).astype(np.float32)
    e2 = _normalize(rng.normal(size=(6, 8))).astype(np.float32)
    got = sigmoid_loss(jnp.array(e1), jnp.array(e2), jnp.float32(1.5), jnp.float32(-10.0))
    want = numpy_sigmoid_loss(e1, e2, 1.5, -10.0)
    assert float(got) == pytest.approx(want, rel=1e-4)


def test_aligned_embeddings_lower_loss(rng):
    e = _normalize(rng.normal(size=(16, 8))).astype(np.float32)
    shuffled = e[rng.permutation(16)]
    scale, bias = jnp.float32(np.log(10.0)), jnp.float32(0.0)
    assert float(clip_loss(e, e, scale, bias)) < float(clip_loss(e, shuffled, scale, bias))


def test_multimodal_pair_sum(rng):
    embs = [_normalize(rng.normal(size=(5, 8))).astype(np.float32) for _ in range(3)]
    scale, bias = jnp.float32(1.0), jnp.float32(0.0)
    total = clip_loss_multimodal(embs, scale, bias)
    manual = sum(
        float(clip_loss(embs[i], embs[j], scale, bias))
        for i in range(2)
        for j in range(i + 1, 3)
    )
    assert float(total) == pytest.approx(manual, rel=1e-5)
    # per-pair scales
    scales = jnp.array([1.0, 2.0, 0.5])
    total2 = clip_loss_multimodal(embs, scales, jnp.zeros(3))
    manual2 = sum(
        float(clip_loss(embs[i], embs[j], scales[c], jnp.float32(0.0)))
        for c, (i, j) in enumerate([(0, 1), (0, 2), (1, 2)])
    )
    assert float(total2) == pytest.approx(manual2, rel=1e-5)
    # sigmoid wrapper also runs
    sigmoid_loss_multimodal(embs, scale, bias)


def test_weighted_cross_entropy_matches_torch_semantics(rng):
    # torch CrossEntropyLoss(weight=w): sum(w_yi * nll_i) / sum(w_yi)
    logits = rng.normal(size=(10, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=10)
    w = np.array([0.33, 0.06, 1.0], dtype=np.float32)
    logp = logits - logits.max(1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(1, keepdims=True))
    nll = -logp[np.arange(10), labels]
    want = (nll * w[labels]).sum() / w[labels].sum()
    got = weighted_cross_entropy(jnp.array(logits), jnp.array(labels), jnp.array(w))
    assert float(got) == pytest.approx(want, rel=1e-5)
    # unweighted = plain mean
    got_u = weighted_cross_entropy(jnp.array(logits), jnp.array(labels), None)
    assert float(got_u) == pytest.approx(nll.mean(), rel=1e-5)


def test_mse():
    a = jnp.array([1.0, 2.0])
    b = jnp.array([0.0, 4.0])
    assert float(mse_loss(a, b)) == pytest.approx(2.5)
