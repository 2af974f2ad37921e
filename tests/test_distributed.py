"""Unit tests for the multi-host scaffolding on the single-process 8-device
CPU mesh (the 2-process integration path is tests/test_multiprocess.py)."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_supernovae_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    global_put,
    make_global_mesh,
)
from multimodal_supernovae_tpu.parallel.distributed import _num_slices, initialize


def test_make_global_mesh_shapes():
    mesh = make_global_mesh()
    assert dict(mesh.shape) == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh = make_global_mesh(n_model=2)
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_global_mesh(n_model=3)


def test_num_slices_single_process():
    assert _num_slices(jax.devices()) == 1


def test_global_put_matches_device_put():
    mesh = make_global_mesh()
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    for spec in (P(), P(DATA_AXIS), P(None, DATA_AXIS)):
        sh = NamedSharding(mesh, spec)
        a = global_put(x, sh)
        assert a.sharding == sh
        np.testing.assert_array_equal(np.asarray(a), x)


def test_global_put_pytree():
    mesh = make_global_mesh()
    sh = NamedSharding(mesh, P(DATA_AXIS))
    tree = {"a": np.ones((8, 2)), "b": np.zeros((16,))}
    out = global_put(tree, sh)
    assert out["a"].sharding == sh
    assert out["b"].sharding == sh


def test_initialize_noop_without_cluster_env(monkeypatch):
    for k in ("MMSN_COORDINATOR", "MMSN_NUM_PROCESSES", "MMSN_PROCESS_ID",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
              "SLURM_JOB_NUM_NODES", "CLOUD_TPU_TASK_ID"):
        monkeypatch.delenv(k, raising=False)
    assert initialize() is False


def test_initialize_ignores_single_worker_hostname(monkeypatch):
    """A tunnelled backend exports TPU_WORKER_HOSTNAMES=localhost in every
    process; treating that as a pod hung the training CLIs (round-2 bug).
    Only a genuinely multi-worker signal may trigger auto-init."""
    monkeypatch.delenv("MMSN_COORDINATOR", raising=False)
    monkeypatch.delenv("MMSN_NUM_PROCESSES", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize() is False


def test_mesh_from_args_cli_glue(monkeypatch):
    """The shared --mesh/--tp argparse glue used by all training CLIs."""
    import argparse

    from multimodal_supernovae_tpu.parallel.distributed import (
        add_mesh_args,
        mesh_from_args,
    )

    monkeypatch.delenv("MMSN_COORDINATOR", raising=False)
    monkeypatch.delenv("MMSN_NUM_PROCESSES", raising=False)
    ap = argparse.ArgumentParser()
    add_mesh_args(ap)

    assert mesh_from_args(ap.parse_args([])) is None  # default: no mesh
    mesh = mesh_from_args(ap.parse_args(["--mesh"]))
    assert dict(mesh.shape) == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh = mesh_from_args(ap.parse_args(["--tp", "2"]))  # implies --mesh
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
