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


def test_eval_runner_rotation_matches_reference_semantics(rng):
    """The reference's val loaders rotate images by a random multiple of 90
    degrees even at noise level 0 (src/dataloader.py:103-114; val loaders
    built with noise 0 at script_wandb.py:94). make_eval_runner must
    reproduce that by default for image runs, and be a no-op without images.
    Oracle: the same loss computation with rotation applied explicitly."""
    import optax

    from multimodal_supernovae_tpu.data.augment import augment_batch
    from multimodal_supernovae_tpu.data.batching import Batch
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.state import TrainState
    from multimodal_supernovae_tpu.training.step import (
        make_eval_runner,
        make_loss_computer,
    )

    seq = dict(SEQ)
    conv = {"dim": 8, "depth": 1, "kernel_size": 3, "patch_size": 10,
            "n_out": 8, "dropout_prob": 0.0}
    cfg = CLIPConfig.create(
        combinations=("host_galaxy", "lightcurve"), enc_dim=8, nband=2,
        transformer_kwargs=seq, conv_kwargs=conv, use_pallas=False,
    )
    model = CLIPModel(cfg)
    b, t = 8, 10
    data = Batch(
        x_lc=jnp.array(rng.normal(size=(b, t)).astype(np.float32)),
        t_lc=jnp.array(np.abs(rng.normal(size=(b, t))).astype(np.float32)),
        mask_lc=jnp.ones((b, t), dtype=bool),
        err_lc=jnp.array(0.1 * np.abs(rng.normal(size=(b, t))).astype(np.float32)),
        x_img=jnp.array(rng.random((b, 20, 20, 3)).astype(np.float32)),
        redshift=jnp.array(rng.random(b).astype(np.float32)),
    )
    variables = model.init(jax.random.PRNGKey(0), data.take(jnp.arange(4)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=optax.sgd(0.0),
        batch_stats=variables.get("batch_stats"),
    )
    plan = jnp.arange(8).reshape(2, 4)
    key = jax.random.PRNGKey(5)

    losses_rot, _ = make_eval_runner(model, rotate_images=True)(
        state, data, plan, key)
    losses_plain, _ = make_eval_runner(model, rotate_images=False)(
        state, data, plan, key)

    # oracle: identical key schedule, rotation applied explicitly
    compute = make_loss_computer(model)
    k, want = key, []
    for row in np.asarray(plan):
        k, aug_key, sub = jax.random.split(k, 3)
        aug = augment_batch(data.take(jnp.array(row)), aug_key,
                            rotate_images=True)
        loss, _, _ = compute(state.params, state.batch_stats, aug, None, sub,
                             False)
        want.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses_rot), np.asarray(want),
                               rtol=1e-5)
    # rotation must actually change image-run losses vs deterministic eval
    assert not np.allclose(np.asarray(losses_rot), np.asarray(losses_plain))

    # without images, the flag is a no-op
    data_lc = data.replace(x_img=None)
    cfg2 = CLIPConfig.create(
        combinations=("lightcurve",), enc_dim=8, nband=2,
        transformer_kwargs=seq, use_pallas=False, regression=True,
    )
    m2 = CLIPModel(cfg2)
    v2 = m2.init(jax.random.PRNGKey(0), data_lc.take(jnp.arange(4)))
    s2 = TrainState.create(apply_fn=m2.apply, params=v2["params"],
                           tx=optax.sgd(0.0), batch_stats=None)
    l_rot, _ = make_eval_runner(m2, rotate_images=True)(s2, data_lc, plan, key)
    l_plain, _ = make_eval_runner(m2, rotate_images=False)(s2, data_lc, plan, key)
    np.testing.assert_allclose(np.asarray(l_rot), np.asarray(l_plain))
