"""AOT serving export (evaluation/export.py): serialize -> reload -> call
without the model object, across model task variants."""

import json

import numpy as np
import pytest

import jax

from multimodal_supernovae_tpu.evaluation.export import (
    batch_to_dict,
    encode_input_fields,
    export_encoder,
    load_exported,
    modality_names,
)
from multimodal_supernovae_tpu.models import CLIPModel

from tests.test_clip_model import tiny_batch, tiny_cfg


def _roundtrip(cfg, batch):
    model = CLIPModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    data = export_encoder(model, variables, batch)
    assert isinstance(data, bytes) and len(data) > 0
    fn, exported = load_exported(data)
    got = fn(batch_to_dict(batch, cfg.combinations))
    want = model.apply(variables, batch, method=model.encode)
    assert len(got) == len(want) == len(modality_names(model))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)
    return exported


def test_export_roundtrip_bimodal(rng):
    exported = _roundtrip(tiny_cfg(), tiny_batch(rng))
    # metadata for serving-host shape validation
    assert exported.platforms and len(exported.in_avals) > 0


def test_export_roundtrip_trimodal_with_vit(rng):
    cfg = tiny_cfg(
        combinations=("host_galaxy", "lightcurve", "spectral"),
        image_encoder="vit",
        vit_kwargs={"emb": 16, "depth": 1, "heads": 2, "patch_size": 5,
                    "n_out": 6},
    )
    _roundtrip(cfg, tiny_batch(rng, with_img=True))


def test_export_artifact_needs_no_model_code(rng):
    """The artifact input is a plain dict of arrays — a host that only has
    the serialized bytes (no CLIPModel, no Batch class) can serve it."""
    model = CLIPModel(tiny_cfg())
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    data = export_encoder(model, variables, batch)

    plain = {k: np.asarray(v)
             for k, v in batch_to_dict(batch, model.cfg.combinations).items()}
    fn, _ = load_exported(data)
    out = fn(plain)  # numpy dict in, no package classes involved
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_export_rejects_wrong_shapes(rng):
    model = CLIPModel(tiny_cfg())
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    fn, _ = load_exported(export_encoder(model, variables, batch))
    # exported at b=4
    bad = batch_to_dict(tiny_batch(rng, b=8), model.cfg.combinations)
    with pytest.raises(Exception):
        fn(bad)


def test_batch_to_dict_drops_absent_modalities(rng):
    d = batch_to_dict(tiny_batch(rng))  # no image
    assert "x_img" not in d and "x_lc" in d
    assert all(v is not None for v in d.values())


def test_serving_contract_excludes_training_only_fields(rng):
    """The artifact's required inputs are exactly the fields encode reads:
    no err_lc/err_sp (augmentation-only), no redshift/label unless the
    model has a meta tower."""
    assert encode_input_fields(("lightcurve", "spectral")) == (
        "x_lc", "t_lc", "mask_lc", "x_sp", "t_sp", "mask_sp")
    assert "redshift" in encode_input_fields(("meta",))

    model = CLIPModel(tiny_cfg())  # lightcurve + spectral, no meta
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    data = export_encoder(model, variables, batch)
    fn, exported = load_exported(data)

    d = batch_to_dict(batch, model.cfg.combinations)
    assert set(d) == {"x_lc", "t_lc", "mask_lc", "x_sp", "t_sp", "mask_sp"}
    # the exported pytree agrees: passing the full batch dict (with err
    # fields) is a structure mismatch, the filtered dict is accepted
    with pytest.raises(Exception):
        fn(batch_to_dict(batch))
    out = fn(d)
    assert len(out) == 2


@pytest.mark.slow
def test_export_cli(tmp_path):
    """scripts/export_model.py end-to-end: train a tiny run, export the
    artifact + manifest with --check, reload the bytes standalone."""
    import os
    import subprocess
    import sys

    import yaml

    from fixtures import write_mini_ztfbts

    REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    data_dir, spectra_dir, _ = write_mini_ztfbts(str(tmp_path), n=10, seed=0)

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    cfg = yaml.safe_load(open(os.path.join(REPO, "configs", "smoke.yaml")))
    cfg["parameters"]["epochs"] = {"values": [1]}
    cfg["parameters"]["batchsize"] = {"values": [4]}
    cfg["extra_args"]["max_spectral_data_len"] = 32
    cfg["extra_args"]["max_lightcurve_data_len"] = 8
    cfg_path = tmp_path / "smoke.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    dataset, nband, _ = load_ztfbts(
        data_dir=data_dir, spectra_dir=spectra_dir,
        combinations=("lightcurve", "spectral"),
        max_data_len_lc=8, max_data_len_spec=32, kfolds=None,
    )
    sweep = load_sweep(str(cfg_path))
    sweep_dir = make_sweep_dir(sweep, str(tmp_path / "analysis"), "smoke")
    results = run_sweep(sweep, dataset, nband=2, folds=None,
                        sweep_dir=sweep_dir)
    run_dir = results[0]["run_dir"]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    art = tmp_path / "model.stablehlo"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_model.py"),
         str(run_dir), "--out", str(art), "--batch-size", "4",
         "--platform", "cpu", "--check"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "CHECK OK" in out.stdout
    manifest = json.load(open(str(art) + ".json"))
    assert manifest["batch_size"] == 4
    assert manifest["output_modalities"] == ["lightcurve", "spectral"]
    # exactly the fields encode reads — no training-only arrays
    assert set(manifest["input"]) == {
        "x_lc", "t_lc", "mask_lc", "x_sp", "t_sp", "mask_sp"}

    # the bytes alone are servable
    from multimodal_supernovae_tpu.evaluation.export import load_exported
    fn, exported = load_exported(open(art, "rb").read())
    feed = {
        k: np.zeros(v["shape"], dtype=v["dtype"])
        for k, v in manifest["input"].items()
    }
    outs = fn(feed)
    assert len(outs) == 2 and np.asarray(outs[0]).shape[0] == 4
