"""Preflight (--check) validation: shape-check a sweep without data or
devices. The reference has no counterpart — its config errors surface
minutes into a W&B agent run (script_wandb.py:32-271); here they surface
in seconds via jax.eval_shape."""

import copy
import os

import pytest

from multimodal_supernovae_tpu.config import load_sweep
from multimodal_supernovae_tpu.training.preflight import (
    abstract_batch,
    format_report,
    preflight_run,
    preflight_sweep,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
SMOKE = os.path.join(REPO, "configs", "smoke.yaml")


def _smoke_sweep(**param_overrides):
    sweep = load_sweep(SMOKE)
    sweep = copy.deepcopy(sweep)
    for k, v in param_overrides.items():
        sweep.parameters[k] = [v]
    return sweep


def _lens(extra):
    return (
        2 * int(extra.get("max_lightcurve_data_len", 100)),
        int(extra.get("max_spectral_data_len", 1000)),
    )


def test_abstract_batch_shapes():
    b = abstract_batch(("lightcurve", "spectral", "host_galaxy"), 8, 32, 64)
    assert b.x_lc.shape == (8, 32)
    assert b.mask_sp.shape == (8, 64)
    assert b.x_img.shape == (8, 60, 60, 3)
    assert b.label.shape == (8,)
    # absent modalities stay None (static pytree contract)
    assert abstract_batch(("lightcurve",), 8, 32, 64).x_sp is None


def test_preflight_ok():
    sweep = _smoke_sweep()
    lc, sp = _lens(sweep.extra_args)
    reports, errors = preflight_sweep(sweep, nband=2, lc_len=lc, sp_len=sp)
    assert errors == []
    assert len(reports) == 1
    r = reports[0]
    assert r["task"] == "contrastive"
    assert r["n_params"] > 0
    assert r["train_state_bytes"] > 2 * r["param_bytes"]
    # both towers get a dispatch note
    towers = [n.split(":")[0] for n in r["notes"]]
    assert "lightcurve" in towers and "spectral" in towers
    out = format_report(reports, errors)
    assert "1 run(s) OK, 0 error(s)" in out


def test_preflight_catches_bad_heads():
    # emb=8, heads=3: the SelfAttention head split asserts emb % heads == 0
    sweep = _smoke_sweep(heads=3)
    lc, sp = _lens(sweep.extra_args)
    reports, errors = preflight_sweep(sweep, nband=2, lc_len=lc, sp_len=sp)
    assert reports == []
    assert len(errors) == 1
    assert "run-0" in errors[0]


def test_preflight_catches_missing_key():
    sweep = _smoke_sweep()
    del sweep.parameters["n_out"]
    lc, sp = _lens(sweep.extra_args)
    reports, errors = preflight_sweep(sweep, nband=2, lc_len=lc, sp_len=sp)
    assert len(errors) == 1 and "n_out" in errors[0]


def test_preflight_mesh_divisibility():
    sweep = _smoke_sweep(batchsize=30)
    lc, sp = _lens(sweep.extra_args)
    reports, errors = preflight_sweep(
        sweep, nband=2, lc_len=lc, sp_len=sp,
        mesh_shape={"data": 4, "model": 1},
    )
    assert len(errors) == 1
    assert "not divisible" in errors[0]
    # the run itself still shape-checks (report emitted alongside the error)
    assert len(reports) == 1


def test_preflight_missing_pretrain_path():
    sweep = _smoke_sweep()
    sweep.extra_args["pretrain_lc_path"] = "/nonexistent/ckpt"
    lc, sp = _lens(sweep.extra_args)
    _, errors = preflight_sweep(sweep, nband=2, lc_len=lc, sp_len=sp)
    assert any("pretrain_lc_path" in e for e in errors)


def test_preflight_masked_builder_lc_only():
    from multimodal_supernovae_tpu.models.factory import masked_model_builder

    sweep = _smoke_sweep()
    extra = sweep.extra_args  # combinations lists spectral too; override wins
    lc, sp = _lens(extra)
    reports, errors = preflight_sweep(
        sweep, nband=2, lc_len=lc, sp_len=sp,
        model_builder=masked_model_builder(extra),
        combinations=("lightcurve",),
    )
    assert errors == []
    assert reports[0]["task"] == "masked"
    assert all(not n.startswith("spectral") for n in reports[0]["notes"])


def test_preflight_counts_pretrain_leaf_matches(tmp_path):
    """A real (tiny) masked-pretrain checkpoint grafts into the CLIP tree:
    the preflight must count matched leaves > 0; a structurally wrong
    checkpoint (empty net) must raise the 0-leaves error."""
    import jax
    import numpy as np

    from multimodal_supernovae_tpu.config.config import build_clip_config
    from multimodal_supernovae_tpu.models.clip import CLIPModel
    from multimodal_supernovae_tpu.models.factory import masked_model_builder
    from multimodal_supernovae_tpu.training.checkpoint import (
        graft_masked_pretrain_into_clip,
        save_params,
    )

    sweep = _smoke_sweep()
    extra = sweep.extra_args
    run_cfg = {k: v[0] for k, v in sweep.parameters.items()}
    lc, sp = _lens(extra)

    # build concrete masked-encoder params whose lc tower matches smoke.yaml
    model, _, _, _ = masked_model_builder(extra)(run_cfg, extra, 2)
    batch = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype) if s is not None else None,
        abstract_batch(("lightcurve",), 4, lc, sp),
        is_leaf=lambda x: x is None,
    )
    variables = model.init(jax.random.PRNGKey(0), batch)
    ckpt = tmp_path / "masked"
    save_params(str(ckpt), variables["params"])

    # freeze_backbone_lc also exercises the frozen (multi_transform)
    # optimizer under eval_shape
    extra2 = dict(extra, pretrain_lc_path=str(ckpt), freeze_backbone_lc=True)
    rep = preflight_run(run_cfg, extra2, 2, lc, sp)
    matched, total = rep["pretrain_leaves_matched"]
    assert 0 < matched < total  # encoder leaves land, projections don't

    # unreadable checkpoint path -> the preflight surfaces it as an error
    with pytest.raises(Exception):
        preflight_run(
            run_cfg, dict(extra, pretrain_lc_path=str(tmp_path)), 2, lc, sp
        )

    # wrong checkpoint -> 0 matches -> hard error
    clip = CLIPModel(build_clip_config(run_cfg, extra, 2))
    abstract_clip = jax.eval_shape(
        clip.init, jax.random.PRNGKey(0),
        abstract_batch(tuple(extra["combinations"]), 4, lc, sp),
    )
    merged = graft_masked_pretrain_into_clip(
        abstract_clip["params"], {"net": {}}
    )
    assert all(
        isinstance(l, jax.ShapeDtypeStruct)
        for l in jax.tree_util.tree_leaves(merged)
    )


@pytest.mark.slow
def test_check_cli(tmp_path):
    """scripts/train.py --check validates a sweep with NO data dir and NO
    sweep-dir side effects, and exits non-zero on a bad grid point."""
    import subprocess
    import sys

    import yaml

    cfg = yaml.safe_load(open(SMOKE))
    cfg_path = tmp_path / "smoke.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    cmd = [sys.executable, os.path.join(REPO, "scripts", "train.py"),
           str(cfg_path), "--check",
           "--analysis-path", str(tmp_path / "analysis")]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=560)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "1 run(s) OK, 0 error(s)" in out.stdout
    assert not (tmp_path / "analysis").exists()  # no side effects

    cfg["parameters"]["heads"] = {"values": [3]}  # emb 8 % 3 != 0
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=560)
    assert out.returncode == 1, out.stdout + out.stderr[-2000:]
    assert "ERROR: run-0" in out.stdout
