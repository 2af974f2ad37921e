import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import (
    CLIPConfig,
    CLIPModel,
    MaskedLightCurveEncoder,
)
from multimodal_supernovae_tpu.models.pretraining import MaskedEncoderConfig
from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def clip_model(**kw):
    cfg = CLIPConfig.create(
        combinations=kw.pop("combinations", ("lightcurve", "spectral")),
        enc_dim=8,
        nband=2,
        transformer_kwargs=SEQ,
        transformer_spectral_kwargs=SEQ,
        use_pallas=False,
        **kw,
    )
    return CLIPModel(cfg)


def split(ds, frac=0.25):
    n_val = max(2, int(len(ds) * frac))
    return ds.subset(np.arange(len(ds) - n_val)), ds.subset(
        np.arange(len(ds) - n_val, len(ds))
    )


def test_contrastive_fit_decreases_loss(tmp_path):
    ds = make_synthetic_dataset(n=48, n_max_lc=10, n_max_sp=12, seed=0)
    train, val = split(ds)
    trainer = Trainer(
        clip_model(loss="softmax", logit_scale_init=10.0),
        task="contrastive",
        cfg=TrainerConfig(epochs=5, batch_size=8, lr=3e-3, seed=0,
                          noise_level_mag=1.0),
        run_dir=str(tmp_path / "run"),
    )
    res = trainer.fit(train, val)
    h = res["history"]["train_loss"]
    assert h[-1] < h[0]
    assert any("AUC_val" in m for m in res["metric_rows"])
    # sidecar contract
    assert os.path.exists(tmp_path / "run" / "config.yaml")
    assert os.path.exists(tmp_path / "run" / "train_filenames.txt")
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
    assert os.path.exists(tmp_path / "run" / "summary.json")
    # checkpoints written
    assert os.path.isdir(tmp_path / "run" / "ckpt_best")
    assert res["best_ckpt_epoch"] is not None
    # split manifests round-trip
    names = [l.strip() for l in open(tmp_path / "run" / "val_filenames.txt")]
    assert names == val.filenames


def test_regression_fit(tmp_path):
    ds = make_synthetic_dataset(n=40, n_max_lc=10, n_max_sp=12, seed=1)
    train, val = split(ds)
    trainer = Trainer(
        clip_model(combinations=("lightcurve",), regression=True),
        task="regression",
        cfg=TrainerConfig(epochs=4, batch_size=8, lr=3e-3, seed=0),
        run_dir=None,
    )
    res = trainer.fit(train, val)
    assert res["history"]["train_loss"][-1] < res["history"]["train_loss"][0]
    assert "R2_val" in res["metric_rows"][-1]


def test_classification_fit_monitors_f1(tmp_path):
    ds = make_synthetic_dataset(n=40, n_max_lc=10, n_max_sp=12, seed=2, n_classes=3)
    train, val = split(ds)
    trainer = Trainer(
        clip_model(combinations=("lightcurve",), classification=True, n_classes=3),
        task="classification",
        cfg=TrainerConfig(epochs=3, batch_size=8, lr=3e-3, seed=0),
        run_dir=None,
        n_classes=3,
    )
    assert trainer.monitor == "f1_val" and trainer.mode == "max"
    res = trainer.fit(train, val)
    assert "f1_val" in res["metric_rows"][-1]


def test_masked_pretraining_fit():
    ds = make_synthetic_dataset(n=40, n_max_lc=10, n_max_sp=12, seed=3)
    train, val = split(ds)
    model = MaskedLightCurveEncoder(
        MaskedEncoderConfig.create(
            f_mask=0.3, nband=2,
            transformer_kwargs={"n_out": 1, "emb": 8, "heads": 2, "depth": 1,
                                "use_pallas": False},
        )
    )
    trainer = Trainer(
        model,
        task="masked",
        cfg=TrainerConfig(epochs=4, batch_size=8, lr=3e-3, seed=0,
                          step_size=2, gamma=0.5),
        run_dir=None,
    )
    res = trainer.fit(train, val)
    assert res["history"]["train_loss"][-1] < res["history"]["train_loss"][0]


def test_early_stopping():
    ds = make_synthetic_dataset(n=24, n_max_lc=8, n_max_sp=8, seed=4)
    train, val = split(ds)
    trainer = Trainer(
        clip_model(),
        task="contrastive",
        cfg=TrainerConfig(epochs=50, batch_size=8, lr=0.0, patience=2, seed=0),
        run_dir=None,
    )
    res = trainer.fit(train, val)
    # lr=0: no improvement after epoch 0 -> stops at patience+1 extra epochs
    assert res["epochs_run"] <= 5
