"""Multi-host training correctness on a simulated pod.

Spawns 2 OS processes, each owning 2 virtual CPU devices, joined through
``jax.distributed`` into one 4-device global runtime (each process = one
'slice'; cross-process collectives stand in for DCN). The full Trainer path
— global (data, model) mesh, multi-process data placement, sharded epoch
scan, metric readback — must produce identical losses on every process AND
match a plain single-process run on the same global device count: process
topology, like sharding, is a placement choice, never a semantics choice.

The reference is strictly single-process (SURVEY.md §2.5); this pins the
genuinely new pod-scale surface (parallel/distributed.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(n_proc: int, local_devices: int, n_model: int = 1,
                 epochs: int = 2, run_dir: str = None, exit_skew: float = 0.0,
                 ensemble: bool = False):
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.update({
            "MMSN_COORDINATOR": f"127.0.0.1:{port}",
            "MMSN_NUM_PROCESSES": str(n_proc),
            "MMSN_PROCESS_ID": str(pid),
            # the distributed runtime must not inherit the parent's forced
            # 8-device flag; the worker sets its own local device count
            "XLA_FLAGS": "",
        })
        cmd = [sys.executable, WORKER, "--local-devices", str(local_devices),
               "--epochs", str(epochs), "--n-model", str(n_model)]
        if run_dir:
            cmd += ["--run-dir", run_dir]
        if exit_skew:
            cmd += ["--exit-skew", str(exit_skew)]
        if ensemble:
            cmd += ["--ensemble"]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    results = []
    try:
        for p in procs:
            # 1200 s: each worker pays a full JAX import + CPU compile; on
            # the saturated 1-core CI host the whole slow suite shares that
            # core and 600 s expired spuriously (r2 and r3 both observed the
            # flake).
            out, err = p.communicate(timeout=1200)
            assert p.returncode == 0, f"worker failed:\nSTDOUT:{out}\nSTDERR:{err}"
            line = [l for l in out.splitlines() if l.startswith("RESULT ")]
            assert line, f"no RESULT line:\n{out}\n{err}"
            results.append(json.loads(line[-1][len("RESULT "):]))
    finally:
        # On a timeout or a failed worker, reap EVERY child: a surviving
        # worker pair saturates the 1-core host and cascades barrier
        # deadline failures into the remaining two-process tests (observed
        # in the r5 full-suite run: one 1200 s timeout -> three failures).
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return results


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    multi = _run_workers(n_proc=2, local_devices=2)
    assert all(r["n_processes"] == 2 for r in multi)
    assert all(r["global_devices"] == 4 for r in multi)
    assert all(r["mesh_shape"] == {"data": 4, "model": 1} for r in multi)

    # every process sees identical global losses
    np.testing.assert_array_equal(multi[0]["train_loss"], multi[1]["train_loss"])
    np.testing.assert_array_equal(multi[0]["val_loss"], multi[1]["val_loss"])

    # and the 2-process x 2-device run equals 1-process x 4-device
    single = _run_workers(n_proc=1, local_devices=4)[0]
    np.testing.assert_allclose(
        multi[0]["train_loss"], single["train_loss"], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        multi[0]["val_loss"], single["val_loss"], rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_two_process_ensemble_members():
    """fit_members with the member axis sharded over a 2-process global
    mesh: every process reads back identical per-member losses/metrics
    over DCN (training/ensemble._to_host), and they match the same
    ensemble run unsharded in one process."""
    multi = _run_workers(n_proc=2, local_devices=2, epochs=2, ensemble=True)
    assert all(r["n_processes"] == 2 for r in multi)
    assert multi[0]["members"] == multi[1]["members"]

    # same members, no mesh, in THIS process — member trajectories agree
    import numpy as np_

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.ensemble import Member, fit_members
    from multimodal_supernovae_tpu.training.trainer import TrainerConfig

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=seq,
        transformer_spectral_kwargs=seq, use_pallas=False,
    )
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=0)
    idx = np_.arange(64)
    members = [
        Member(f"run-{i}", i, np_.roll(idx, 16 * i)[:48],
               np_.roll(idx, 16 * i)[48:])
        for i in range(4)
    ]
    res = fit_members(
        CLIPModel(cfg), "contrastive",
        TrainerConfig(epochs=2, batch_size=16, lr=3e-3, seed=0,
                      noise_level_mag=1.0),
        ds, members,
    )
    for m in members:
        got = multi[0]["members"][m.name]
        ref = res["members"][m.name]
        np.testing.assert_allclose(
            got["train_loss"], ref["history"]["train_loss"],
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            got["val_loss"], ref["history"]["val_loss"],
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            got["auc"],
            [r["AUC_val"] for r in ref["metric_rows"] if "AUC_val" in r],
            atol=1e-4)


@pytest.mark.slow
def test_two_process_checkpointing(tmp_path):
    """Multi-host checkpointing: every process participates in the orbax
    save (sharded-state requirement), only process 0 writes sidecars; the
    resulting run dir restores on a plain single-process 8-device mesh —
    pod-written checkpoints must be portable to any topology."""
    run_dir = str(tmp_path / "run")
    multi = _run_workers(n_proc=2, local_devices=2, epochs=2, run_dir=run_dir)
    assert all(r["best_ckpt_epoch"] is not None for r in multi)
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(run_dir, "ckpt_last"))

    # restore in THIS process (single-process virtual 8-device mesh)
    import jax
    import jax.numpy as jnp

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.checkpoint import CheckpointManager
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=seq, transformer_spectral_kwargs=seq,
        use_pallas=False,
    )
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=0)
    trainer = Trainer(CLIPModel(cfg), task="contrastive",
                      cfg=TrainerConfig(epochs=2, batch_size=16, lr=3e-3,
                                        seed=0, noise_level_mag=1.0))
    state = trainer.init_state(ds.to_device().take(jnp.arange(16)))
    ckpts = CheckpointManager(run_dir)
    restored = ckpts.try_restore_last(state)
    assert restored is not None
    state2, epoch = restored
    assert epoch == 1  # last of 2 epochs (0-indexed)
    # restored params differ from the fresh init (training happened)
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params))
    ]
    assert max(diffs) > 1e-6


@pytest.mark.slow
def test_two_process_exit_skew(tmp_path):
    """Regression for the round-2 shutdown-barrier DEADLINE_EXCEEDED flake:
    rank 0 stalls several seconds in its post-fit checkpoint close (the
    shared-FS write path on a real pod) while rank 1 finishes instantly.
    trainer._fit_end_barrier must hold rank 1 until rank 0's writes are
    done, so BOTH workers exit 0 instead of rank 0 dying when rank 1 tears
    down the coordination service at interpreter exit."""
    run_dir = str(tmp_path / "run")
    multi = _run_workers(n_proc=2, local_devices=2, epochs=1,
                         run_dir=run_dir, exit_skew=6.0)
    assert all(r["n_processes"] == 2 for r in multi)
    np.testing.assert_array_equal(multi[0]["train_loss"],
                                  multi[1]["train_loss"])
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))


@pytest.mark.slow
def test_two_process_model_parallel():
    """dp x tp over two processes: model axis within a 'slice', data across."""
    multi = _run_workers(n_proc=2, local_devices=2, n_model=2, epochs=1)
    assert all(r["mesh_shape"] == {"data": 2, "model": 2} for r in multi)
    np.testing.assert_array_equal(multi[0]["train_loss"], multi[1]["train_loss"])
    single = _run_workers(n_proc=1, local_devices=4, n_model=2, epochs=1)[0]
    np.testing.assert_allclose(
        multi[0]["train_loss"], single["train_loss"], rtol=5e-5, atol=5e-5
    )
