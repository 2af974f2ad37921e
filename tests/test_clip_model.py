import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.data.batching import Batch
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel


def tiny_cfg(**kw):
    seq = {"n_out": 6, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    conv = {"dim": 8, "depth": 1, "kernel_size": 3, "patch_size": 10, "n_out": 6,
            "dropout_prob": 0.0}
    meta = {"input_dim": 8, "hidden_dim": 8, "num_layers": 1}
    defaults = dict(
        combinations=("lightcurve", "spectral"),
        enc_dim=4,
        nband=2,
        transformer_kwargs=seq,
        transformer_spectral_kwargs=seq,
        conv_kwargs=conv,
        meta_kwargs=meta,
        use_pallas=False,
    )
    defaults.update(kw)
    return CLIPConfig.create(**defaults)


def tiny_batch(rng, b=4, with_img=False, t=10, s=8):
    kw = dict(
        x_lc=jnp.array(rng.normal(size=(b, t)).astype(np.float32)),
        t_lc=jnp.array(np.abs(rng.normal(size=(b, t))).astype(np.float32)),
        mask_lc=jnp.ones((b, t), dtype=bool),
        err_lc=jnp.array(0.1 * np.abs(rng.normal(size=(b, t))).astype(np.float32)),
        x_sp=jnp.array(rng.normal(size=(b, s)).astype(np.float32)),
        t_sp=jnp.array(np.abs(rng.normal(size=(b, s))).astype(np.float32)),
        mask_sp=jnp.ones((b, s), dtype=bool),
        err_sp=jnp.array(0.1 * np.abs(rng.normal(size=(b, s))).astype(np.float32)),
        redshift=jnp.array(rng.random(b).astype(np.float32)),
        label=jnp.array(rng.integers(0, 5, b).astype(np.int32)),
    )
    if with_img:
        kw["x_img"] = jnp.array(rng.random((b, 20, 20, 3)).astype(np.float32))
    return Batch(**kw)


def test_contrastive_forward_returns_normalized_embeddings(rng):
    cfg = tiny_cfg()
    model = CLIPModel(cfg)
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    embs = model.apply(variables, batch)
    assert len(embs) == 2
    for e in embs:
        assert e.shape == (4, 4)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5
        )


def test_trimodal_with_meta(rng):
    cfg = tiny_cfg(combinations=("host_galaxy", "lightcurve", "spectral", "meta"))
    model = CLIPModel(cfg)
    batch = tiny_batch(rng, with_img=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    embs = model.apply(variables, batch)
    assert len(embs) == 4


def test_logit_params_exist(rng):
    cfg = tiny_cfg()
    model = CLIPModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), tiny_batch(rng))
    assert float(variables["params"]["logit_scale"]) == pytest.approx(np.log(10.0))
    assert float(variables["params"]["logit_bias"]) == pytest.approx(-10.0)


@pytest.mark.parametrize("mode", ["regression", "classification"])
def test_supervised_heads(rng, mode):
    cfg = tiny_cfg(regression=mode == "regression", classification=mode == "classification")
    model = CLIPModel(cfg)
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.shape == (4, 1 if mode == "regression" else 5)


@pytest.mark.parametrize("loss", ["softmax", "sigmoid"])
def test_loss_fn_differentiable(rng, loss):
    cfg = tiny_cfg(loss=loss)
    model = CLIPModel(cfg)
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss_of(params):
        l, _ = model.apply({"params": params}, batch, method=model.loss_fn)
        return l

    val, grads = jax.value_and_grad(loss_of)(variables["params"])
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)
    # logit params receive gradient
    assert abs(float(grads["logit_scale"])) > 0


def test_supervised_loss_fn(rng):
    cfg = tiny_cfg(classification=True, n_classes=5)
    model = CLIPModel(cfg)
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    loss, aux = model.apply(variables, batch, method=model.loss_fn)
    assert np.isfinite(float(loss))
    assert aux["logits"].shape == (4, 5)
