"""Preemption recovery through the REAL CLIs: SIGKILL mid-training +
supervised auto-restart (scripts/supervise.py appending --resume) must
reproduce an uninterrupted run bit-for-bit, for

  * scripts/pretrain_sim.py            — the flagship long job
    (/root/reference's maven pretraining, pretrain_config/
    maven_pretrain_config.yaml), in-memory AND --streaming
    (shard-cursor resume through Trainer.fit_sharded);
  * scripts/train.py --parallel-folds  — the stacked k-fold recipe
    (_ensemble checkpoint, training/ensemble.py) driven end-to-end at
    sweep level under the supervisor.

tests/test_kill_resume.py proves the Trainer-level contract; this file
proves the CLI plumbing around it (run_sweep resume + skip-completed,
ensemble bookkeeping restore, fit_sharded cursors)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from fixtures import write_mini_sim_hdf5, write_mini_ztfbts

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))
WORKER = os.path.join(HERE, "cli_kill_worker.py")
SUPERVISE = os.path.join(REPO, "scripts", "supervise.py")

SEQ_PARAMS = {
    "n_out": {"values": [8]}, "enc_dim": {"values": [8]},
    "transformer_depth": {"values": [1]}, "emb": {"values": [8]},
    "heads": {"values": [2]}, "agg": {"values": ["mean"]},
    "emb_spectral": {"values": [8]},
    "transformer_depth_spectral": {"values": [1]},
    "agg_spectral": {"values": ["mean"]},
    "lr": {"values": [0.003]}, "batchsize": {"values": [8]},
    "epochs": {"values": [5]}, "seed": {"values": [0]},
}


def _env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    return env


def _last_ckpt_params(run_dir):
    """The raw params pytree of the run's latest ckpt_last."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(
        os.path.join(os.path.abspath(run_dir), "ckpt_last")
    )
    step = mgr.latest_step()
    assert step is not None, f"no ckpt_last under {run_dir}"
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    return step, restored["params"]


def _assert_params_equal(dir_a, dir_b):
    step_a, pa = _last_ckpt_params(dir_a)
    step_b, pb = _last_ckpt_params(dir_b)
    assert step_a == step_b
    import jax

    leaves_a = jax.tree_util.tree_leaves_with_path(pa)
    leaves_b = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(pb)
    )
    assert len(leaves_a) == len(leaves_b)
    for path, leaf in leaves_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(leaves_b[jax.tree_util.keystr(path)]),
            err_msg=f"param {jax.tree_util.keystr(path)} diverged "
                    f"after kill+resume",
        )


def _run(cmd, timeout):
    out = subprocess.run(cmd, capture_output=True, text=True, env=_env(),
                         cwd=REPO, timeout=timeout)
    assert out.returncode == 0, (
        f"command failed ({out.returncode}):\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-3000:]}"
    )
    return out.stdout


def _worker_cmd(cli, cli_args, kill_marker=None, kill_after_epoch=2):
    cmd = [sys.executable, WORKER, "--cli", cli]
    if kill_marker:
        cmd += ["--kill-marker", kill_marker,
                "--kill-after-epoch", str(kill_after_epoch)]
    return cmd + ["--"] + cli_args


def _supervised(worker_cmd):
    return [sys.executable, SUPERVISE, "--max-restarts", "2",
            "--backoff", "0.5", "--"] + worker_cmd


@pytest.mark.slow
@pytest.mark.parametrize("streaming", [False, True],
                         ids=["inmemory", "streaming"])
def test_pretrain_sim_sigkill_resume(tmp_path, streaming):
    sim_dir = tmp_path / "sim_data"
    sim_dir.mkdir()
    write_mini_sim_hdf5(str(sim_dir / "ZTF_Pretrain_5Class.hdf5"),
                        n_per_type=10)
    cfg = {
        "method": "grid",
        "parameters": SEQ_PARAMS,
        "extra_args": {
            "filename_trainset": "ZTF_Pretrain_5Class.hdf5",
            "combinations": ["lightcurve", "spectral"],
            "noise": False, "nruns": 1, "val_fraction": 0.25,
            "max_spectral_data_len": 24, "max_lightcurve_data_len": 8,
            "spectral_rescalefactor": 1,
        },
    }
    with open(tmp_path / "pre.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    def cli_args(tag):
        args = [str(tmp_path / "pre.yaml"),
                "--data-dir", str(sim_dir),
                "--analysis-path", str(tmp_path / f"analysis-{tag}"),
                "--cache-dir", str(tmp_path / f"cache-{tag}"),
                "--platform", "cpu"]
        if streaming:
            args += ["--streaming", "--rows-per-shard", "6"]
        return args

    # uninterrupted baseline
    _run(_worker_cmd("pretrain_sim", cli_args("base")), timeout=600)
    base_run = tmp_path / "analysis-base" / "pre" / "run-0"
    assert (base_run / "summary.json").exists()

    # SIGKILL while logging epoch 2 + supervised relaunch with --resume
    marker = str(tmp_path / "killed.marker")
    out = _run(
        _supervised(_worker_cmd("pretrain_sim", cli_args("kill"),
                                kill_marker=marker, kill_after_epoch=2)),
        timeout=900,
    )
    assert os.path.exists(marker), "the injected SIGKILL never fired"
    assert "restart 1/2" in out
    kill_run = tmp_path / "analysis-kill" / "pre" / "run-0"
    assert (kill_run / "summary.json").exists()

    _assert_params_equal(str(base_run), str(kill_run))

    # streaming: the shard cursor must exist (shard-granular resume path)
    if streaming:
        assert (kill_run / "ckpt_cursor").is_dir()


@pytest.mark.slow
def test_train_parallel_folds_sigkill_resume(tmp_path):
    """Verdict r3 item 8: supervise.py -- train.py --parallel-folds --resume
    SIGKILLed mid-ensemble-epoch resumes bit-compatibly at sweep level."""
    data_dir, spectra_dir, _ = write_mini_ztfbts(str(tmp_path), n=16, seed=0)
    params = dict(SEQ_PARAMS)
    params["foldnumber"] = {"values": [0, 1]}
    params["epochs"] = {"values": [4]}
    cfg = {
        "method": "grid",
        "parameters": params,
        "extra_args": {
            "combinations": ["lightcurve", "spectral"],
            "nruns": 2, "kfolds": 2, "n_classes": 5,
            "max_spectral_data_len": 24, "max_lightcurve_data_len": 8,
            "spectral_rescalefactor": 1.0e14,
        },
    }
    with open(tmp_path / "grid.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    def cli_args(tag):
        return [str(tmp_path / "grid.yaml"),
                "--data-dir", data_dir, "--spectra-dir", spectra_dir,
                "--analysis-path", str(tmp_path / f"analysis-{tag}"),
                "--cache-dir", str(tmp_path / f"cache-{tag}"),
                "--parallel-folds", "--platform", "cpu"]

    _run(_worker_cmd("train", cli_args("base")), timeout=600)

    marker = str(tmp_path / "killed.marker")
    out = _run(
        _supervised(_worker_cmd("train", cli_args("kill"),
                                kill_marker=marker, kill_after_epoch=1)),
        timeout=900,
    )
    assert os.path.exists(marker)
    assert "restart 1/2" in out

    for run in ("run-0", "run-1"):
        base_run = tmp_path / "analysis-base" / "grid" / run
        kill_run = tmp_path / "analysis-kill" / "grid" / run
        assert (kill_run / "summary.json").exists()
        _assert_params_equal(str(base_run), str(kill_run))
    # the kill fired while member run-0 logged epoch 1, so ITS row appears
    # twice (killed attempt + resumed re-do); run-1 never logged it before
    # the kill and has exactly one
    for run, want in (("run-0", 2), ("run-1", 1)):
        rows = [l for l in
                open(tmp_path / "analysis-kill" / "grid" / run /
                     "metrics.jsonl")
                if '"epoch": 1' in l]
        assert len(rows) == want, (run, len(rows))
