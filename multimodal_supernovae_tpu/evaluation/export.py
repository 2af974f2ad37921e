"""Ahead-of-time model export (StableHLO) for serving.

Serializes the frozen encoder — params baked in, preprocessing-free — to a
self-contained artifact via ``jax.export``: the saved bytes carry the
StableHLO program plus in/out pytree structure and can be reloaded and
called WITHOUT this package's model code (any process with jax can serve
it, on the platforms it was lowered for). This is the deployment-facing
complement of the live path (scripts/infer.py): the live path needs the
model class and checkpoint; the artifact needs neither.

No reference counterpart (the reference serves nothing; its closest path
re-builds the torch model per use, evaluate_models.py:269-303). TPU-native
rationale: StableHLO is exactly what the XLA TPU compiler consumes, so the
artifact is the chip's native serving format — no tracing at load time, no
Python model code on the serving host.

Notes:
  * The batch dimension is exported at a FIXED size per artifact (static
    shapes are what the TPU wants); export several batch sizes if needed —
    artifacts are small (the dominant cost is the baked-in params).
  * The attention dispatch is resolved at export-trace time: exporting
    with a CPU-lowered platform list picks the dense path; a TPU-lowered
    export of long-sequence encoders embeds the Pallas kernel as a custom
    call (TPU-only artifact; verified on v5e — reload + call matches the
    live model bit-exactly).
  * Flash-kernel artifacts must be EXPORTED on a TPU host too: flax's
    ``model.init`` executes the forward once, and the kernel cannot
    execute on a CPU backend (dense-dispatch configs export from any
    host).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import numpy as np

from ..data.batching import MODALITIES, Batch

# Batch fields CLIPModel.encode actually reads per modality
# (models/clip.py:258-279). err_lc/err_sp are augmentation-only and
# redshift/label are meta-tower inputs — none belong in a serving
# contract unless the model uses them.
ENCODE_FIELDS = {
    "host_galaxy": ("x_img",),
    "lightcurve": ("x_lc", "t_lc", "mask_lc"),
    "spectral": ("x_sp", "t_sp", "mask_sp"),
    "meta": ("label", "redshift"),
}


def encode_input_fields(combinations) -> Tuple[str, ...]:
    """The exact Batch fields ``encode`` reads for these modalities."""
    out = []
    for m in MODALITIES:
        if m in combinations:
            out.extend(ENCODE_FIELDS[m])
    return tuple(out)


def _specs(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tree
    )


def batch_to_dict(batch: Batch, combinations=None) -> Dict:
    """The artifact's input format: a PLAIN dict of the present (non-None)
    Batch fields — the serving host needs no class from this package.

    With ``combinations`` the dict is restricted to the fields ``encode``
    actually reads for those modalities, so the serving contract carries no
    dead training-only arrays (err_lc/err_sp, unused redshift/label)."""
    keep = None if combinations is None else set(encode_input_fields(combinations))
    return {f.name: getattr(batch, f.name)
            for f in dataclasses.fields(batch)
            if getattr(batch, f.name) is not None
            and (keep is None or f.name in keep)}


def export_encoder(
    model,
    variables: Dict,
    example_batch: Batch,
    platforms: Tuple[str, ...] = None,
) -> bytes:
    """Serialize ``model.encode`` with ``variables`` baked in.

    The artifact takes ONE argument — a plain dict of arrays (the
    ``batch_to_dict(batch, model.cfg.combinations)`` form of a ``Batch``:
    only the fields ``encode`` reads, exact example shapes/dtypes) — and
    returns the tuple of L2-normalized per-modality embeddings in
    canonical order (same contract as evaluation/embeddings
    .get_embeddings).
    """

    def encode(d):
        return model.apply(variables, Batch(**d), method=model.encode)

    kw = {"platforms": list(platforms)} if platforms else {}
    exported = jax.export.export(jax.jit(encode), **kw)(
        _specs(batch_to_dict(example_batch, model.cfg.combinations))
    )
    return bytes(exported.serialize())


def load_exported(data: bytes):
    """Rebuild a callable from ``export_encoder`` bytes.

    Returns (fn, exported): ``fn(batch) -> embeddings tuple``; ``exported``
    exposes metadata (``in_avals``, ``platforms``) for shape validation.
    """
    exported = jax.export.deserialize(bytearray(data))
    return exported.call, exported


def modality_names(model) -> List[str]:
    """Output-embedding order — the canonical MODALITIES order encode uses."""
    return [m for m in MODALITIES if m in model.cfg.combinations]
