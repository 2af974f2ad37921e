"""bfloat16 compute-path sanity: same architecture, bf16 matmuls, results
statistically close to f32 and trainable."""

import numpy as np
import pytest

import jax

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel

SEQ = {"n_out": 8, "emb": 16, "heads": 2, "depth": 2, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def _cfg(dtype):
    return CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=SEQ, transformer_spectral_kwargs=SEQ,
        use_pallas=False, compute_dtype=dtype,
    )


def test_bf16_embeddings_close_to_f32():
    ds = make_synthetic_dataset(n=16, n_max_lc=8, n_max_sp=8, seed=0)
    batch = ds.host_batch(np.arange(16))
    m32, m16 = CLIPModel(_cfg(None)), CLIPModel(_cfg("bfloat16"))
    variables = m32.init(jax.random.PRNGKey(0), batch)
    # params are f32 in both; bf16 only changes the compute path
    e32 = m32.apply(variables, batch)
    e16 = m16.apply(variables, batch)
    for a, b in zip(e32, e16):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        # normalized embeddings: cosine similarity per row should be high
        cos = np.sum(a * b, axis=-1)
        assert cos.min() > 0.99


def test_bf16_loss_grad_finite():
    ds = make_synthetic_dataset(n=8, n_max_lc=8, n_max_sp=8, seed=1)
    batch = ds.host_batch(np.arange(8))
    model = CLIPModel(_cfg("bfloat16"))
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss_of(p):
        l, _ = model.apply({"params": p}, batch, method=model.loss_fn)
        return l

    val, grads = jax.value_and_grad(loss_of)(variables["params"])
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
        assert g.dtype == np.float32  # grads land in param dtype
