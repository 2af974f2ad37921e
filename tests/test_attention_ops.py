import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_supernovae_tpu.ops.attention import MASK_FILL, dense_attention


def numpy_reference_attention(q, k, v, key_mask, emb):
    """Independent NumPy oracle for the reference MHSA math
    (e**-1/4 scaling on q and k, -1e7 key fill, softmax over keys)."""
    scale = emb ** -0.25
    scores = np.einsum("bhts,bhus->bhtu", q * scale, k * scale)
    if key_mask is not None:
        scores = np.where(key_mask[:, None, None, :], scores, MASK_FILL)
    scores = scores - scores.max(axis=-1, keepdims=True)
    w = np.exp(scores)
    w = w / w.sum(axis=-1, keepdims=True)
    return np.einsum("bhtu,bhus->bhts", w, v)


@pytest.mark.parametrize("use_mask", [True, False])
def test_dense_attention_matches_numpy(rng, use_mask):
    b, h, t, s = 2, 2, 7, 4
    emb = h * s
    q = rng.normal(size=(b, h, t, s)).astype(np.float32)
    k = rng.normal(size=(b, h, t, s)).astype(np.float32)
    v = rng.normal(size=(b, h, t, s)).astype(np.float32)
    mask = rng.random((b, t)) > 0.3 if use_mask else None
    if use_mask:
        mask[:, 0] = True  # at least one valid key
    out = dense_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                          None if mask is None else jnp.array(mask), emb)
    expected = numpy_reference_attention(q, k, v, mask, emb)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_masked_keys_get_zero_weight(rng):
    b, h, t, s = 1, 1, 6, 8
    q = rng.normal(size=(b, h, t, s)).astype(np.float32)
    k = rng.normal(size=(b, h, t, s)).astype(np.float32)
    v = rng.normal(size=(b, h, t, s)).astype(np.float32)
    mask = np.array([[True, True, True, False, False, False]])
    out1 = dense_attention(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(mask), h * s)
    # Perturb values at masked key positions: output must not change.
    v2 = v.copy()
    v2[:, :, 3:, :] += 100.0
    out2 = dense_attention(jnp.array(q), jnp.array(k), jnp.array(v2), jnp.array(mask), h * s)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
