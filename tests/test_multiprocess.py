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


def _run_workers(n_proc: int, local_devices: int, n_model: int = 1, epochs: int = 2):
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
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--local-devices", str(local_devices),
             "--epochs", str(epochs), "--n-model", str(n_model)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        ))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\nSTDOUT:{out}\nSTDERR:{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err}"
        results.append(json.loads(line[-1][len("RESULT "):]))
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
def test_two_process_model_parallel():
    """dp x tp over two processes: model axis within a 'slice', data across."""
    multi = _run_workers(n_proc=2, local_devices=2, n_model=2, epochs=1)
    assert all(r["mesh_shape"] == {"data": 2, "model": 2} for r in multi)
    np.testing.assert_array_equal(multi[0]["train_loss"], multi[1]["train_loss"])
    single = _run_workers(n_proc=1, local_devices=4, n_model=2, epochs=1)[0]
    np.testing.assert_allclose(
        multi[0]["train_loss"], single["train_loss"], rtol=5e-5, atol=5e-5
    )
