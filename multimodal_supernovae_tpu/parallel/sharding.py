"""Sharding specifications for batches and parameters.

Batches shard their leading (sample) dimension over the ``data`` axis.
Parameters are replicated over ``data``; when the mesh has a non-trivial
``model`` axis, the wide matmuls — transformer feed-forward kernels and the
ConvMixer head — shard their output (and the following layer its input)
dimension over ``model``, the standard Megatron column/row split. XLA then
inserts the reduce-scatter/all-gather pair on the ``model`` axis
automatically under jit; we only annotate placements.

All shardings are plain ``NamedSharding``s consumed by ``jax.device_put`` /
``jax.jit(in_shardings=...)`` — the idiomatic pjit workflow.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (sample) sharding over the data axis; all trailing
    dimensions replicated. Works for every field of a Batch pytree."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array of a Batch pytree with its leading dim over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


# -- parameter partitioning --------------------------------------------------

# Parameter-name suffixes whose kernels take the Megatron COLUMN split
# (output dim sharded over `model`): the FF expansion and the wide ConvMixer
# head. Their consumers take the ROW split (input dim sharded), so the pair
# needs only one psum.
_COL_SPLIT = ("ff_in", "head_fc1")
_ROW_SPLIT = ("ff_out", "head_fc2")


def _spec_for(path, value, n_model: int) -> P:
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    if n_model > 1 and value.ndim == 2:
        if any(n in names for n in _COL_SPLIT) and value.shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if any(n in names for n in _ROW_SPLIT) and value.shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
    if n_model > 1 and value.ndim == 1:
        # biases of column-split layers shard with the output dim
        if any(n in names for n in _COL_SPLIT) and value.shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    return P()


def param_sharding_rules(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a parameter pytree."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, _spec_for(path, v, n_model)), params
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place parameters on the mesh per the partition rules. Multi-process
    safe: every process initialises identical params from the same seed and
    contributes the shards of its addressable devices."""
    from .distributed import global_put

    shardings = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(global_put, params, shardings)
