"""Serving-path CLI: batch-infer embeddings from a trained run dir through
scripts/infer.py (subprocess, the real user entry point). The run is
trained in-process on the mini ZTFBTS fixture (fast under the test
harness); the CLI then re-ingests the same data from disk, reloads the
checkpoint, restricts to the run's val manifest and writes the npz/JSON
artifact contract."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from fixtures import write_mini_ztfbts

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_infer_cli_embeddings(tmp_path):
    data_dir, spectra_dir, ids = write_mini_ztfbts(str(tmp_path), n=10, seed=0)

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
    npz_path = tmp_path / "out" / "embs.npz"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "infer.py"),
         str(run_dir), "--out", str(npz_path), "--split", "val",
         "--data-dir", data_dir, "--spectra-dir", spectra_dir,
         "--cache-dir", str(tmp_path / "cache")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    data = np.load(npz_path, allow_pickle=False)
    val_names = [l.strip() for l in
                 open(os.path.join(run_dir, "val_filenames.txt"))
                 .read().splitlines() if l]
    assert sorted(data["filenames"].tolist()) == sorted(val_names)
    for key in ("emb_lightcurve", "emb_spectral"):
        assert key in data, list(data.keys())
        emb = data[key]
        assert emb.shape[0] == len(val_names)
        np.testing.assert_allclose(
            np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4
        )

    manifest = json.load(open(str(npz_path).replace(".npz", ".json")))
    assert manifest["task"] == "contrastive_embeddings"
    assert manifest["n_samples"] == len(val_names)
    assert manifest["split"] == "val"
