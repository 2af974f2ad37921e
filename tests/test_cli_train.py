"""Full CLI surface test: scripts/train.py end-to-end on the on-disk mini
ZTFBTS fixture, in a subprocess (the real user entry point)."""

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
def test_train_cli_end_to_end(tmp_path):
    data_dir, spectra_dir, ids = write_mini_ztfbts(str(tmp_path), n=10, seed=0)

    cfg = yaml.safe_load(open(os.path.join(REPO, "configs", "smoke.yaml")))
    cfg["parameters"]["epochs"] = {"values": [1]}
    cfg["parameters"]["batchsize"] = {"values": [4]}
    cfg["extra_args"]["max_spectral_data_len"] = 32
    cfg["extra_args"]["max_lightcurve_data_len"] = 8
    cfg_path = tmp_path / "smoke.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # single CPU device: fastest compile in-subprocess
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "train.py"),
            str(cfg_path),
            "--data-dir", data_dir,
            "--spectra-dir", spectra_dir,
            "--analysis-path", str(tmp_path / "analysis"),
            "--cache-dir", str(tmp_path / "cache"),
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    run_dir = tmp_path / "analysis" / "smoke" / "run-0"
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "summary.json").exists()
    summary = json.load(open(run_dir / "summary.json"))
    assert np.isfinite(summary["best_val_loss"])
    assert "best_auc" in summary
    # second invocation hits the ingest cache
    out2 = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "train.py"),
            str(cfg_path),
            "--data-dir", data_dir,
            "--spectra-dir", spectra_dir,
            "--analysis-path", str(tmp_path / "analysis2"),
            "--cache-dir", str(tmp_path / "cache"),
            "--epochs", "1",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=560,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert "cache=hit" in out2.stdout
