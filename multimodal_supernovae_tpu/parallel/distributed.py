"""Multi-host (pod / multi-slice) scaffolding.

Single-controller JAX runs one Python process per host; each process only
*addresses* its local chips but jit-compiled programs span the global device
set. This module provides the three pieces the rest of the framework needs
to scale past one host without changing any model or step code:

  * ``initialize()`` — ``jax.distributed.initialize`` wiring. On TPU pods
    the coordinator/process-id are auto-detected from the TPU metadata; for
    CPU-based multi-process tests they are passed explicitly.
  * ``make_global_mesh()`` — a (data, model) mesh over ``jax.devices()``
    (the GLOBAL device list). When more than one slice/host is present the
    data axis is built DCN-aware: ``mesh_utils.create_hybrid_device_mesh``
    places the inter-slice (DCN) dimension OUTERMOST within the data axis,
    so XLA's hierarchical collectives reduce over ICI within a slice first
    and cross DCN only once per slice. The mesh keeps the same
    ``(DATA_AXIS, MODEL_AXIS)`` contract as ``mesh.make_mesh`` — every
    existing sharding rule applies unchanged.
  * ``global_put()`` — host-to-global-array placement that works in both
    single- and multi-process runs. Every process is expected to hold the
    SAME full host array (our datasets are small and every host loads the
    same files; the epoch plan is derived from a shared seed); the callback
    form hands each addressable shard its slice without any cross-host
    transfer of host memory.

The reference is strictly single-process (SURVEY.md §2.5 — no distributed
code of any kind); this is new TPU-native surface.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding

from .mesh import DATA_AXIS, MODEL_AXIS

_ENV_COORD = "MMSN_COORDINATOR"
_ENV_NPROC = "MMSN_NUM_PROCESSES"
_ENV_PID = "MMSN_PROCESS_ID"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
) -> bool:
    """Initialize the JAX distributed runtime if a multi-process topology is
    configured; no-op (returns False) otherwise.

    Resolution order: explicit args > ``MMSN_COORDINATOR``/``MMSN_NUM_PROCESSES``/
    ``MMSN_PROCESS_ID`` env vars > TPU-pod auto-detection (when JAX's own
    cluster envs are present). Safe to call twice (second call is a no-op).
    """
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])

    if coordinator_address is None and num_processes is None:
        # No explicit config. Only auto-initialize when the environment
        # advertises MORE THAN ONE worker — single-entry pod variables (a
        # tunnelled/emulated backend exports TPU_WORKER_HOSTNAMES=localhost)
        # must not trigger a coordinator handshake that would hang or fail
        # a plain single-host run. Fail soft either way.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multiworker = (
            len([h for h in hostnames.split(",") if h.strip()]) > 1
            or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
            or int(os.environ.get("SLURM_JOB_NUM_NODES", "1") or 1) > 1
        )
        if not multiworker:
            return False
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return False
        return True

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # double-init is a no-op, not an error
        if "already" in str(e).lower():
            return False
        raise
    return True


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def _num_slices(devices) -> int:
    """Number of DCN-connected groups. TPU devices carry ``slice_index``;
    CPU multi-process runs group by ``process_index`` (each host is its own
    'slice' — collectives between them cross the network, like DCN)."""
    keys = set()
    for d in devices:
        keys.add(getattr(d, "slice_index", None) if getattr(d, "slice_index", None)
                 is not None else d.process_index)
    return len(keys)


def make_global_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh over ALL global devices, DCN-aware.

    The model axis always lives within a slice (its collectives are
    latency-sensitive); the data axis spans slice-internal ICI innermost and
    DCN outermost, the layout under which XLA lowers the DP psum /
    contrastive all-gather to one intra-slice reduction plus one inter-slice
    exchange (scaling-book recipe).
    """
    devices = jax.devices()
    n = len(devices)
    if n % n_model:
        raise ValueError(f"{n} global devices not divisible by model={n_model}")
    n_slices = _num_slices(devices)
    per_slice = n // n_slices
    if n_slices == 1:
        grid = np.array(devices).reshape(n // n_model, n_model)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    if per_slice % n_model:
        raise ValueError(
            f"model axis {n_model} must fit within one slice ({per_slice} devices)"
        )
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // n_model, n_model),
        dcn_mesh_shape=(n_slices, 1),
        devices=devices,
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def global_put(x: Any, sharding: NamedSharding):
    """Place a host array (or pytree of arrays) as a (possibly) multi-host
    global jax.Array. Every process must hold the same full array(s).

    Single-process: plain device_put. Multi-process: build the global array
    from per-device callbacks — each process materialises only the shards of
    its addressable devices.
    """
    def put_one(arr, sh):
        if jax.process_count() == 1:
            return jax.device_put(arr, sh)
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    if isinstance(sharding, NamedSharding):
        return jax.tree_util.tree_map(lambda a: put_one(a, sharding), x)
    return jax.tree_util.tree_map(put_one, x, sharding)


def add_mesh_args(ap) -> None:
    """Attach the shared --mesh/--tp CLI flags to an argparse parser."""
    ap.add_argument("--mesh", action="store_true",
                    help="shard training over all devices (data x model mesh)")
    ap.add_argument("--tp", type=int, default=1,
                    help="model (tensor-parallel) axis size; implies --mesh")


def mesh_from_args(args) -> Optional[Mesh]:
    """Resolve the CLI mesh request: joins the distributed runtime when a
    pod/cluster is detected (or MMSN_* env is set), then builds the global
    (data, model) mesh if sharding was requested or we are multi-host."""
    multihost = initialize()
    if not (args.mesh or args.tp > 1 or multihost):
        return None
    mesh = make_global_mesh(n_model=args.tp)
    print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    return mesh


def fetch_global_scalar(x: jax.Array) -> float:
    """Execution barrier + value readback for multi-host metric outputs.

    Requires a fully-REPLICATED array (every metric this framework reads
    back is psum/pmean-reduced before it leaves the jitted step): each
    device then holds the complete value, so the local addressable shard
    IS the global array and no collective is needed. ``process_allgather``
    is the wrong tool here — on this jax version it rejects
    non-fully-addressable inputs without ``tiled=True``, and its output
    layout differs between replicated and sharded inputs (ADVICE r2/r3)."""
    if jax.process_count() > 1 and not x.is_fully_addressable:
        if not x.sharding.is_fully_replicated:
            raise ValueError(
                "fetch_global_scalar needs a fully-replicated array; "
                f"got sharding {x.sharding}. Reduce (psum/pmean) inside "
                "the jitted step before reading the value back."
            )
        x = x.addressable_shards[0].data
    return float(np.asarray(x).sum())
