"""Preemption recovery: SIGKILL mid-epoch + supervised auto-restart must
reproduce an uninterrupted run bit-for-bit.

The worker (tests/kill_resume_worker.py) kills ITSELF with SIGKILL after
epoch 2's metrics are logged but before its checkpoint lands — the epoch in
flight is lost, exactly what a pod preemption does. scripts/supervise.py
must relaunch it with --resume; the resumed run restores ckpt_last
(epoch 1), re-advances the host RNGs, re-does epoch 2 and finishes.
Final parameters must EQUAL the uninterrupted run's: recovery is a replay,
never a perturbation."""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "kill_resume_worker.py")
SUPERVISE = os.path.join(HERE, "..", "scripts", "supervise.py")


def _worker_cmd(run_dir, **kw):
    cmd = [sys.executable, WORKER, "--run-dir", run_dir]
    for k, v in kw.items():
        cmd += [f"--{k.replace('_', '-')}", str(v)]
    return cmd


def _env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""  # don't inherit the 8-device test flag
    return env


@pytest.mark.slow
def test_sigkill_resume_bit_identical(tmp_path):
    # uninterrupted baseline
    base_dir = str(tmp_path / "base")
    subprocess.run(_worker_cmd(base_dir), check=True, timeout=300, env=_env())
    base = np.load(os.path.join(base_dir, "final.npz"))

    # killed mid-epoch-2 + supervised relaunch with --resume
    kill_dir = str(tmp_path / "killed")
    marker = str(tmp_path / "killed.marker")
    cmd = [sys.executable, SUPERVISE, "--max-restarts", "2",
           "--backoff", "0.5", "--"] + _worker_cmd(
        kill_dir, kill_marker=marker, kill_after_epoch=2)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         env=_env())
    assert out.returncode == 0, f"supervised run failed:\n{out.stdout}\n{out.stderr}"
    assert os.path.exists(marker), "the injected SIGKILL never fired"
    assert "restart 1/2" in out.stdout, out.stdout

    got = np.load(os.path.join(kill_dir, "final.npz"))
    assert set(got.files) == set(base.files)
    for k in base.files:
        np.testing.assert_array_equal(
            got[k], base[k],
            err_msg=f"param {k} diverged after kill+resume",
        )

    # the run dir shows both the lost epoch's row (from the killed attempt)
    # and the re-done one (from the resumed attempt)
    rows = [l for l in open(os.path.join(kill_dir, "metrics.jsonl"))
            if '"epoch": 2' in l]
    assert len(rows) == 2


def test_supervisor_propagates_success_and_failure(tmp_path):
    from multimodal_supernovae_tpu.cli.supervise import (
        build_restart_cmd,
        supervise,
    )

    assert supervise([sys.executable, "-c", "pass"], max_restarts=2,
                     backoff=0.0) == 0
    # a command that always fails exhausts restarts and propagates the code
    assert supervise([sys.executable, "-c", "import sys; sys.exit(3)"],
                     max_restarts=1, backoff=0.0) == 3
    assert build_restart_cmd(["x", "--resume"], "--resume") == ["x", "--resume"]
    assert build_restart_cmd(["x"], "--resume") == ["x", "--resume"]
