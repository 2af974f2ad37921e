"""The full Maven pipeline through the real CLIs, end-to-end:

  1. scripts/pretrain_sim.py     — CLIP pretraining on a simulated HDF5 corpus
  2. scripts/finetune_clip.py    — CLIP fine-tuning on (fixture) real data,
                                   weights carried from step 1
  3. scripts/export_embeddings.py — frozen-embedding export from the
                                   fine-tuned run

Mirrors the reference's two-stage Maven recipe (README.md:24,
pretraining_clip_wandb.py -> finetune_clip.py) in subprocesses.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from fixtures import write_mini_sim_hdf5, write_mini_ztfbts

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def run_cli(script, *args, timeout=420):
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script),
         *args, "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stderr[-3000:]}"
    return out.stdout


@pytest.mark.slow
def test_maven_pipeline(tmp_path):
    # fixtures: sim HDF5 + real-format mini ZTFBTS
    sim_dir = tmp_path / "sim_data"
    sim_dir.mkdir()
    write_mini_sim_hdf5(str(sim_dir / "ZTF_Pretrain_5Class.hdf5"), n_per_type=10)
    data_dir, spectra_dir, _ = write_mini_ztfbts(str(tmp_path), n=10, seed=0)

    params = {
        "n_out": {"values": [8]}, "enc_dim": {"values": [8]},
        "transformer_depth": {"values": [1]}, "emb": {"values": [8]},
        "heads": {"values": [2]}, "agg": {"values": ["mean"]},
        "emb_spectral": {"values": [8]},
        "transformer_depth_spectral": {"values": [1]},
        "agg_spectral": {"values": ["mean"]},
        "lr": {"values": [0.003]}, "batchsize": {"values": [8]},
        "epochs": {"values": [2]}, "seed": {"values": [0]},
    }
    pretrain_cfg = {
        "method": "grid",
        "parameters": params,
        "extra_args": {
            "filename_trainset": "ZTF_Pretrain_5Class.hdf5",
            "combinations": ["lightcurve", "spectral"],
            "noise": False, "nruns": 1, "val_fraction": 0.25,
            "max_spectral_data_len": 24, "max_lightcurve_data_len": 8,
            "spectral_rescalefactor": 1,
        },
    }
    with open(tmp_path / "pre.yaml", "w") as f:
        yaml.safe_dump(pretrain_cfg, f)

    # 1. sim pretraining
    out1 = run_cli(
        "pretrain_sim.py", str(tmp_path / "pre.yaml"),
        "--data-dir", str(sim_dir),
        "--analysis-path", str(tmp_path / "analysis"),
        "--cache-dir", str(tmp_path / "cache"),
    )
    pre_run = tmp_path / "analysis" / "pre" / "run-0"
    assert (pre_run / "summary.json").exists()
    assert "sim dataset: 20 samples" in out1

    # 2. fine-tune on (fixture) real data from the pretrained run
    ft_cfg = {
        "method": "grid",
        "parameters": {k: v for k, v in params.items()},
        "extra_args": {
            "pretrain_path": str(pre_run),
            "freeze_backbone": True,
            "combinations": ["lightcurve", "spectral"],
            "nruns": 1, "val_fraction": 0.3,
            "max_spectral_data_len": 24, "max_lightcurve_data_len": 8,
            "spectral_rescalefactor": 1.0e14,
        },
    }
    with open(tmp_path / "ft.yaml", "w") as f:
        yaml.safe_dump(ft_cfg, f)
    run_cli(
        "finetune_clip.py", str(tmp_path / "ft.yaml"),
        "--data-dir", data_dir, "--spectra-dir", spectra_dir,
        "--analysis-path", str(tmp_path / "analysis"),
        "--cache-dir", str(tmp_path / "cache2"),
    )
    ft_run = tmp_path / "analysis" / "ft" / "run-0"
    assert (ft_run / "summary.json").exists()
    summary = json.load(open(ft_run / "summary.json"))
    assert np.isfinite(summary["best_val_loss"])

    # 3. export embeddings from the fine-tuned model
    out_npz = tmp_path / "embs.npz"
    run_cli(
        "export_embeddings.py", "--run", str(ft_run),
        "--data-dir", data_dir, "--spectra-dir", spectra_dir,
        "--out", str(out_npz), "--split", "val",
        "--max-lc-len", "8", "--max-spec-len", "24", "--rescale", "1e14",
    )
    data = np.load(out_npz, allow_pickle=False)
    assert data["emb_lightcurve"].shape[1] == 8
    assert data["emb_spectral"].shape == data["emb_lightcurve"].shape
    assert len(data["filenames"]) == data["emb_lightcurve"].shape[0] > 0
    np.testing.assert_allclose(
        np.linalg.norm(data["emb_lightcurve"], axis=1), 1.0, rtol=1e-5
    )
