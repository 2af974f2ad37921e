"""Self-describing run dirs: the model_config.json sidecar.

Every run this framework's Trainer writes carries the exact serialized
model config, so a run dir reloads with NO parent sweep_config.yaml and no
pretrained run dir on disk — unlike the reference, whose load_config
hard-requires ``{run}/../sweep_config.yaml`` (models_multimodal.py:559-580).
The sweep-schema rebuild stays and must agree exactly where both apply.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
import yaml

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import (
    CLIPConfig,
    CLIPModel,
    MaskedLightCurveEncoder,
)
from multimodal_supernovae_tpu.models.clip_mlp import ClipMLPConfig, ClipMLPHead
from multimodal_supernovae_tpu.models.factory import (
    MODEL_CONFIG_SIDECAR,
    dump_model_config,
    initialize_from_run_dir,
    load_model,
    load_run_config,
    read_model_config,
    write_model_config,
)
from multimodal_supernovae_tpu.models.pretraining import MaskedEncoderConfig
from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def _clip_model(**kw):
    return CLIPModel(CLIPConfig.create(
        combinations=kw.pop("combinations", ("lightcurve", "spectral")),
        enc_dim=8, nband=2, transformer_kwargs=SEQ,
        transformer_spectral_kwargs=SEQ, use_pallas=False, **kw))


@pytest.mark.parametrize("model", [
    _clip_model(),
    _clip_model(regression=True, combinations=("lightcurve",)),
    MaskedLightCurveEncoder(MaskedEncoderConfig.create(
        f_mask=0.25, nband=2, transformer_kwargs=SEQ)),
    ClipMLPHead(ClipMLPConfig(clip=_clip_model().cfg,
                              combinations=("lightcurve",),
                              hidden_dim=16, num_layers=2,
                              classification=True, n_classes=3)),
])
def test_dump_read_roundtrip_exact(model, tmp_path):
    assert write_model_config(str(tmp_path), model)
    # through real JSON (tuples become lists on disk)
    payload = json.load(open(tmp_path / MODEL_CONFIG_SIDECAR))
    assert payload["model"] == type(model).__name__
    rebuilt, extra = read_model_config(str(tmp_path))
    assert type(rebuilt) is type(model)
    assert rebuilt.cfg == model.cfg  # frozen-dataclass equality, nested
    assert extra["combinations"]


def test_unsupported_model_is_declined(tmp_path):
    class NotAModel:
        pass

    assert dump_model_config(NotAModel()) is None
    assert not write_model_config(str(tmp_path), NotAModel())
    assert read_model_config(str(tmp_path)) is None


def test_trainer_writes_sidecar_and_bare_dir_reloads(tmp_path):
    """A standalone library run (no sweep dir anywhere) trains, then
    load_model / load_run_config work on the bare run dir."""
    ds = make_synthetic_dataset(n=24, n_max_lc=8, n_max_sp=10, seed=3)
    train, val = ds.subset(np.arange(18)), ds.subset(np.arange(18, 24))
    run_dir = tmp_path / "standalone" / "run"
    model = _clip_model(loss="softmax")
    trainer = Trainer(model, task="contrastive",
                      cfg=TrainerConfig(epochs=2, batch_size=6, lr=1e-3),
                      run_dir=str(run_dir))
    result = trainer.fit(train, val)
    assert os.path.exists(run_dir / MODEL_CONFIG_SIDECAR)
    assert not os.path.exists(run_dir.parent / "sweep_config.yaml")

    run_cfg, extra = load_run_config(str(run_dir))  # no sweep sidecar
    assert sorted(extra["combinations"]) == ["lightcurve", "spectral"]

    reloaded, variables, *_ = load_model(
        str(run_dir), val.host_batch(np.arange(2)), which="last")
    assert reloaded.cfg == model.cfg
    # weights really restore: last ckpt equals the final state
    final = result["state"].params
    import jax

    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(final)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sidecar_agrees_with_sweep_schema_rebuild(tmp_path):
    """Where both paths apply, they must build the identical model."""
    from multimodal_supernovae_tpu.config import load_sweep, expand_grid

    sweep = load_sweep(os.path.join(os.path.dirname(__file__), "..",
                                    "configs", "smoke.yaml"))
    point = expand_grid(sweep)[0]
    sweep_dir = tmp_path / "sweep"
    run_dir = sweep_dir / "run-0"
    os.makedirs(run_dir)
    with open(sweep_dir / "sweep_config.yaml", "w") as f:
        yaml.safe_dump(sweep.raw, f)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump(point, f)

    schema_model, schema_cfgd, schema_extra = initialize_from_run_dir(
        str(run_dir))
    write_model_config(str(run_dir), schema_model)
    sidecar_model, sidecar_cfgd, sidecar_extra = initialize_from_run_dir(
        str(run_dir))
    assert sidecar_model.cfg == schema_model.cfg
    assert sidecar_extra["combinations"] == list(
        dict(schema_extra)["combinations"])
    # run_cfg still comes from config.yaml on both paths
    assert sidecar_cfgd["emb"] == schema_cfgd["emb"]


def test_clipmlp_reloads_without_pretrained_dir(tmp_path):
    """The reference rebuilds fine-tune heads from the PRETRAINED run's
    directory (which must still exist); the sidecar removes that."""
    head = ClipMLPHead(ClipMLPConfig(
        clip=_clip_model().cfg, combinations=("lightcurve", "spectral"),
        hidden_dim=16, num_layers=2, regression=True))
    run_dir = tmp_path / "finetune-run"
    os.makedirs(run_dir)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump({"hidden_dim": 16, "num_layers": 2,
                        "pretrain_path": "/does/not/exist/anymore"}, f)
    write_model_config(str(run_dir), head)
    rebuilt, _, extra = initialize_from_run_dir(str(run_dir))
    assert isinstance(rebuilt, ClipMLPHead)
    assert rebuilt.cfg == head.cfg
    assert extra["regression"] is True


def test_combinations_override_replaces_towers(tmp_path):
    model = _clip_model()
    run_dir = tmp_path / "r"
    os.makedirs(run_dir)
    write_model_config(str(run_dir), model)
    sub, _, extra = initialize_from_run_dir(str(run_dir),
                                            combinations=["lightcurve"])
    assert isinstance(sub, CLIPModel)
    assert sub.cfg.combinations == ("lightcurve",)
    assert extra["combinations"] == ["lightcurve"]
    # tower hyperparameters carried over
    assert dict(sub.cfg.transformer_kwargs)["emb"] == SEQ["emb"]
