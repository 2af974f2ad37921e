import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.models import (
    ConvMixer,
    MLP,
    SequenceEncoder,
    time_positional_encoding,
)


def _seq_batch(rng, b=3, t=12):
    x = rng.normal(size=(b, t)).astype(np.float32)
    ts = np.abs(rng.normal(size=(b, t))).astype(np.float32) * 100
    mask = np.ones((b, t), dtype=bool)
    mask[:, t - 3 :] = False
    return jnp.array(x), jnp.array(ts), jnp.array(mask)


def test_time_positional_encoding_structure(rng):
    t = jnp.array(rng.normal(size=(2, 5)).astype(np.float32))
    pe = time_positional_encoding(t, 8, 10000.0)
    assert pe.shape == (2, 5, 8)
    # channel 0 = sin(t * 1), channel 1 = cos(t * 1)
    np.testing.assert_allclose(np.asarray(pe[..., 0]), np.sin(np.asarray(t)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pe[..., 1]), np.cos(np.asarray(t)), rtol=1e-5)
    # frequency decays with channel index
    div1 = np.exp(2 * (-np.log(1e4) / 8))
    np.testing.assert_allclose(
        np.asarray(pe[..., 2]), np.sin(np.asarray(t) * div1), rtol=1e-5
    )


@pytest.mark.parametrize("agg", ["mean", "max", "attn", "pretraining"])
def test_sequence_encoder_shapes(rng, agg):
    x, t, mask = _seq_batch(rng)
    enc = SequenceEncoder(n_out=6, emb=8, heads=2, depth=2, agg=agg, use_pallas=False)
    params = enc.init(jax.random.PRNGKey(0), x, t, mask)
    out = enc.apply(params, x, t, mask)
    if agg == "pretraining":
        assert out.shape == (3, 12, 8)
    else:
        assert out.shape == (3, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_sequence_encoder_mask_invariance(rng):
    """Values and times at padded positions must not affect the output."""
    x, t, mask = _seq_batch(rng)
    enc = SequenceEncoder(n_out=4, emb=8, heads=2, depth=2, agg="mean", use_pallas=False)
    params = enc.init(jax.random.PRNGKey(0), x, t, mask)
    out1 = enc.apply(params, x, t, mask)
    x2 = jnp.where(mask, x, 77.0)
    # NOTE: padded TIME values do affect nothing only through attention; the
    # positional encoding of padded positions feeds attention as queries but
    # those outputs are zeroed before aggregation. Perturb both.
    t2 = jnp.where(mask, t, 123.0)
    out2 = enc.apply(params, x2, t2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_sequence_encoder_band_embedding(rng):
    x, t, mask = _seq_batch(rng, t=12)
    enc1 = SequenceEncoder(n_out=4, emb=8, heads=2, depth=1, nband=1, use_pallas=False)
    enc2 = SequenceEncoder(n_out=4, emb=8, heads=2, depth=1, nband=2, use_pallas=False)
    p2 = enc2.init(jax.random.PRNGKey(0), x, t, mask)
    assert "band_emb" in p2["params"]
    assert p2["params"]["band_emb"]["embedding"].shape == (2, 8)
    out = enc2.apply(p2, x, t, mask)
    assert out.shape == (3, 4)
    p1 = enc1.init(jax.random.PRNGKey(0), x, t, mask)
    assert "band_emb" not in p1["params"]


def test_sequence_encoder_dropout_train_mode(rng):
    x, t, mask = _seq_batch(rng)
    enc = SequenceEncoder(
        n_out=4, emb=8, heads=2, depth=2, dropout=0.5, use_pallas=False
    )
    params = enc.init(jax.random.PRNGKey(0), x, t, mask)
    out_eval = enc.apply(params, x, t, mask, train=False)
    out_eval2 = enc.apply(params, x, t, mask, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))
    out_train = enc.apply(
        params, x, t, mask, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))


def test_convmixer_shapes_and_batchnorm(rng):
    x = jnp.array(rng.random((2, 20, 20, 3)).astype(np.float32))
    model = ConvMixer(dim=8, depth=2, kernel_size=3, patch_size=10, n_out=6, dropout_prob=0.1)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out = model.apply(variables, x)
    assert out.shape == (2, 6)
    # training mode mutates batch stats
    out_t, mutated = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out_t.shape == (2, 6)
    leaf0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    leaf1 = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_mlp(rng):
    x = jnp.array(rng.normal(size=(4, 10)).astype(np.float32))
    mlp = MLP(hidden_dim=16, output_dim=3, num_layers=2, dropout=0.0)
    params = mlp.init(jax.random.PRNGKey(0), x)
    assert mlp.apply(params, x).shape == (4, 3)
