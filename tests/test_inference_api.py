"""Unit tests for the serving-path inference helpers (the fast in-process
complement of tests/test_infer_cli.py)."""

import numpy as np

import jax

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.evaluation.embeddings import (
    masked_reconstruction_mse,
    predict_supervised,
)
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
from multimodal_supernovae_tpu.models.pretraining import (
    MaskedEncoderConfig,
    MaskedLightCurveEncoder,
)

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 100.0,
       "agg": "mean", "dropout": 0.0}


def test_masked_reconstruction_mse_shape_and_determinism():
    ds = make_synthetic_dataset(n=21, n_max_lc=16, nband=2, seed=0,
                                modalities=("lightcurve",))
    cfg = MaskedEncoderConfig.create(transformer_kwargs={
        "emb": 8, "heads": 2, "depth": 1, "time_norm": 100.0, "dropout": 0.0,
    }, nband=2, f_mask=0.3)
    model = MaskedLightCurveEncoder(cfg)
    batch = ds.to_device().take(np.arange(4))
    variables = model.init(jax.random.PRNGKey(0), batch)

    key = jax.random.PRNGKey(1)
    mse = masked_reconstruction_mse(model, variables, ds, key, batch_size=8)
    assert mse.shape == (21,)  # padded tail sliced away
    assert np.isfinite(mse).all() and (mse >= 0).all()
    # seeded: same key, same scores
    np.testing.assert_array_equal(
        mse, masked_reconstruction_mse(model, variables, ds, key, batch_size=8)
    )


def test_predict_supervised_regression_shape():
    ds = make_synthetic_dataset(n=10, n_max_lc=8, nband=2, n_max_sp=8, seed=0)
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        regression=True, transformer_kwargs=SEQ,
        transformer_spectral_kwargs=SEQ, use_pallas=False,
    )
    model = CLIPModel(cfg)
    batch = ds.to_device().take(np.arange(4))
    variables = model.init(jax.random.PRNGKey(0), batch)
    preds = predict_supervised(model, variables, ds, batch_size=4)
    assert preds.shape == (10, 1)
    assert np.isfinite(preds).all()
