"""Checkpoint/resume: a run interrupted after k epochs continues from its
ckpt_last with optimizer state and epoch counter intact."""

import json
import os

import numpy as np
import pytest

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def make_trainer(run_dir, epochs):
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax",
        transformer_kwargs=SEQ, transformer_spectral_kwargs=SEQ,
        use_pallas=False,
    )
    return Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=epochs, batch_size=8, lr=3e-3, seed=0),
        run_dir=run_dir,
    )


def test_resume_continues_training(tmp_path):
    ds = make_synthetic_dataset(n=32, n_max_lc=8, n_max_sp=8, seed=0)
    train, val = ds.subset(np.arange(24)), ds.subset(np.arange(24, 32))
    run_dir = str(tmp_path / "run")

    # phase 1: 3 epochs
    res1 = make_trainer(run_dir, epochs=3).fit(train, val)
    assert res1["epochs_run"] == 3
    params_after_3 = res1["state"].params

    # phase 2: resume, extend to 5 epochs -> exactly 2 more run
    res2 = make_trainer(run_dir, epochs=5).fit(train, val, resume=True)
    rows = res2["metric_rows"]
    assert [r["epoch"] for r in rows] == [3, 4]
    # resumed from trained state, not a fresh init: params moved on from
    # phase 1's values but first resumed loss is near phase 1's last loss
    assert abs(rows[0]["train_loss"] - res1["metric_rows"][-1]["train_loss"]) < 0.5
    k1 = np.asarray(params_after_3["lightcurve_encoder"]["embedding_mag"]["kernel"])
    k2 = np.asarray(
        res2["state"].params["lightcurve_encoder"]["embedding_mag"]["kernel"]
    )
    assert not np.allclose(k1, k2)  # training continued

    # resume with nothing new to do: no epochs run
    res3 = make_trainer(run_dir, epochs=5).fit(train, val, resume=True)
    assert res3["metric_rows"] == []


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    ds = make_synthetic_dataset(n=16, n_max_lc=8, n_max_sp=8, seed=1)
    train, val = ds.subset(np.arange(12)), ds.subset(np.arange(12, 16))
    res = make_trainer(str(tmp_path / "fresh"), epochs=2).fit(
        train, val, resume=True
    )
    assert res["epochs_run"] == 2


def test_run_sweep_resume_skips_completed(tmp_path):
    """continue_sweep semantics (VERDICT r3 item 4): under resume, grid
    points whose run dir already holds a completed summary.json are not
    re-walked; unfinished ones resume from their checkpoint."""
    import yaml

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    cfg = {
        "method": "grid",
        "metric": {"goal": "minimize", "name": "best_val_loss"},
        "parameters": {
            "n_out": {"values": [8]}, "enc_dim": {"values": [8]},
            "transformer_depth": {"values": [1]}, "emb": {"values": [8]},
            "heads": {"values": [2]}, "agg": {"values": ["mean"]},
            "emb_spectral": {"values": [8]},
            "transformer_depth_spectral": {"values": [1]},
            "agg_spectral": {"values": ["mean"]},
            "lr": {"values": [0.003, 0.001]},
            "batchsize": {"values": [8]}, "epochs": {"values": [2]},
            "seed": {"values": [0]},
        },
        "extra_args": {
            "combinations": ["lightcurve", "spectral"], "nruns": 2,
            "val_fraction": 0.25,
        },
    }
    path = tmp_path / "sweep.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    sweep = load_sweep(str(path))
    sweep_dir = make_sweep_dir(sweep, str(tmp_path), "sw")
    ds = make_synthetic_dataset(n=32, n_max_lc=8, n_max_sp=8, seed=0)

    res1 = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sweep_dir)
    assert len(res1) == 2 and not any(r.get("skipped") for r in res1)

    # everything finished: a resumed sweep re-walks nothing
    res2 = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sweep_dir,
                     resume=True)
    assert [r["skipped"] for r in res2] == [True, True]
    assert res2[0]["best"]["value"] is not None

    # run-1 incomplete (summary gone): only IT is re-entered, from ckpt_last
    os.remove(os.path.join(sweep_dir, "run-1", "summary.json"))
    res3 = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sweep_dir,
                     resume=True)
    assert res3[0].get("skipped") is True
    assert "skipped" not in res3[1]
    assert res3[1]["metric_rows"] == []  # already at epoch target: resumed,
    # found nothing left to train, re-wrote its summary
    assert os.path.exists(os.path.join(sweep_dir, "run-1", "summary.json"))


def test_restore_errors_are_specific(tmp_path):
    """Missing checkpoints and structure mismatches get DISTINCT errors
    (ADVICE r3): a run dir with no checkpoint must not be reported as the
    optax.flatten format break."""
    from multimodal_supernovae_tpu.training.checkpoint import CheckpointManager

    ds = make_synthetic_dataset(n=16, n_max_lc=8, n_max_sp=8, seed=2)
    train, val = ds.subset(np.arange(12)), ds.subset(np.arange(12, 16))
    run_dir = str(tmp_path / "run")
    trainer = make_trainer(run_dir, epochs=1)
    state = trainer.init_state(train.to_device().take(np.arange(8)))

    # nothing saved yet: a clear missing-checkpoint error, NOT the format
    # message — and try_restore_last keeps returning None
    empty = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="no 'best' checkpoint"):
        empty.restore(state)
    assert empty.try_restore_last(state) is None

    trainer.fit(train, val)
    ckpts = CheckpointManager(run_dir)

    # matching template restores fine
    restored, epoch = ckpts.try_restore_last(state)
    assert epoch == 0

    # structurally different opt_state (e.g. a pre-optax.flatten per-leaf
    # tree) -> the rebranded format-break RuntimeError
    bad = state.replace(opt_state={"nested": {"m": state.params}})
    with pytest.raises(RuntimeError, match="optax.flatten"):
        ckpts.restore(bad, which="last")
