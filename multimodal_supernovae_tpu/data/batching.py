"""The canonical batch structure and HBM-resident batching.

TPU-first design: after ingest the whole dataset is a dict of fixed-shape
arrays. For training we keep those arrays device-resident and GATHER each
batch inside the jitted step from an index vector — no per-batch host work,
no ragged shapes, no Python in the hot loop. This replaces the reference's
``NoisyDataLoader``/worker-process pipeline (src/dataloader.py:25-287), whose
per-batch Python augmentation loop is its main throughput sink.

The canonical modality order and the 9-field batch contract follow the
reference (src/dataloader.py:117-287, src/models_multimodal.py:313-323):
``(x_img, x_lc, t_lc, mask_lc, x_sp, t_sp, mask_sp, redshift, label)``.
Error arrays (magerr/specerr) ride along for on-device noise augmentation.
Images are stored NHWC (the TPU-native conv layout; the reference uses NCHW).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Fixed modality ordering used everywhere embeddings are listed/concatenated
# (matches the membership-check order in src/models_multimodal.py:229-254).
MODALITIES = ("host_galaxy", "lightcurve", "spectral", "meta")


@struct.dataclass
class Batch:
    """One fixed-shape batch. Absent modalities are ``None`` (static pytree).

    Shapes (B = batch, T = band-blocked LC length, S = spectrum length):
      x_img   (B, H, W, C) float   host-galaxy cutout, NHWC, in [0, 1]
      x_lc    (B, T) float         extinction-corrected magnitudes
      t_lc    (B, T) float         per-band zeroed observation times
      mask_lc (B, T) bool          validity mask
      err_lc  (B, T) float         magnitude errors (augmentation only)
      x_sp    (B, S) float         rescaled spectrum flux
      t_sp    (B, S) float         wavelengths
      mask_sp (B, S) bool
      err_sp  (B, S) float
      redshift (B,) float
      label    (B,) int32          factorized SN type
    """

    x_img: Optional[jax.Array] = None
    x_lc: Optional[jax.Array] = None
    t_lc: Optional[jax.Array] = None
    mask_lc: Optional[jax.Array] = None
    err_lc: Optional[jax.Array] = None
    x_sp: Optional[jax.Array] = None
    t_sp: Optional[jax.Array] = None
    mask_sp: Optional[jax.Array] = None
    err_sp: Optional[jax.Array] = None
    redshift: Optional[jax.Array] = None
    label: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        for f in (self.x_lc, self.x_sp, self.x_img, self.redshift):
            if f is not None:
                return f.shape[0]
        raise ValueError("empty Batch")

    def take(self, idx) -> "Batch":
        """Gather rows by index (jit-friendly)."""
        return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), self)


# Batch field -> array-store key (identity; kept explicit for validation).
BATCH_FIELDS = (
    "x_img", "x_lc", "t_lc", "mask_lc", "err_lc",
    "x_sp", "t_sp", "mask_sp", "err_sp", "redshift", "label",
)


class ArrayDataset:
    """A dataset fully materialised as fixed-shape arrays.

    ``arrays`` maps a subset of BATCH_FIELDS to numpy/jax arrays with a shared
    leading dimension. ``filenames`` keeps the per-row identifier (the
    ZTFBTS name), which is part of the checkpoint/split manifest contract
    (script_wandb.py:58-67, models_multimodal.py:734-743).
    """

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        filenames: Optional[Sequence[str]] = None,
    ):
        unknown = set(arrays) - set(BATCH_FIELDS)
        if unknown:
            raise ValueError(f"unknown batch fields: {sorted(unknown)}")
        lengths = {k: len(v) for k, v in arrays.items()}
        if len(set(lengths.values())) > 1:
            raise ValueError(f"inconsistent lengths: {lengths}")
        self.arrays = dict(arrays)
        self.n = next(iter(lengths.values())) if lengths else 0
        self.filenames = None if filenames is None else list(filenames)
        if self.filenames is not None and len(self.filenames) != self.n:
            raise ValueError("filenames length mismatch")

    def __len__(self) -> int:
        return self.n

    def subset(self, indices) -> "ArrayDataset":
        indices = np.asarray(indices)
        names = (
            [self.filenames[i] for i in indices] if self.filenames is not None else None
        )
        return ArrayDataset({k: v[indices] for k, v in self.arrays.items()}, names)

    def subset_by_filenames(self, names: Sequence[str]) -> "ArrayDataset":
        """Rebuild an exact train/val split from a saved filename manifest."""
        if self.filenames is None:
            raise ValueError("dataset has no filenames")
        wanted = set(names)
        missing = wanted - set(self.filenames)
        if missing:
            raise ValueError(f"{len(missing)} manifest filenames not in dataset")
        idx = [i for i, f in enumerate(self.filenames) if f in wanted]
        return self.subset(np.asarray(idx, dtype=np.int64))

    def to_device(self, sharding=None) -> Batch:
        """Place the full dataset on device(s) as a Batch of arrays.

        With a ``NamedSharding`` the arrays are replicated/sharded as asked;
        by default they land on the default device. Datasets here are small
        (~4.7k real SNe; ~0.5M sim light curves ~ a few GB) so HBM residence
        is the right call — batches are then on-device gathers.
        """
        kwargs = {}
        if sharding is not None:
            # multi-process aware: each host holds the same full arrays and
            # contributes only its addressable shards (parallel/distributed.py)
            from ..parallel.distributed import global_put
        for k, v in self.arrays.items():
            if sharding is not None:
                kwargs[k] = global_put(v, sharding)
            else:
                kwargs[k] = jnp.asarray(v)
        return Batch(**kwargs)

    def host_batch(self, indices: np.ndarray) -> Batch:
        """Assemble a batch on host (slow path / tests)."""
        return Batch(**{k: jnp.asarray(v[indices]) for k, v in self.arrays.items()})


def epoch_indices(
    n: int,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    pad: str = "wrap",
) -> np.ndarray:
    """Index plan for one epoch: shape (steps, batch_size) int32.

    Static batch shapes are mandatory under jit, so the ragged tail is
    handled by ``pad``:
      * "wrap": tail positions reuse indices from the epoch start (training —
        every sample is still visited >= once per epoch);
      * "repeat_last": tail positions repeat the final index; pair with
        ``tail_valid_mask`` to drop duplicates from metrics (evaluation).
      * "drop": drop the incomplete tail batch entirely.
    """
    order = np.arange(n, dtype=np.int32)
    if shuffle:
        if rng is None:
            raise ValueError("shuffle requires a Generator")
        order = rng.permutation(n).astype(np.int32)
    if n == 0:
        return np.zeros((0, batch_size), dtype=np.int32)
    steps = n // batch_size if pad == "drop" else -(-n // batch_size)
    total = steps * batch_size
    if total <= n:
        flat = order[:total]
    elif pad == "wrap":
        # tile: the pad may need MORE than one extra pass when
        # batch_size > 2n (e.g. a small tail shard under streaming)
        flat = np.tile(order, -(-total // n))[:total]
    else:  # repeat_last
        flat = np.concatenate([order, np.full(total - n, order[-1], np.int32)])
    return flat.reshape(steps, batch_size)


def tail_valid_mask(n: int, batch_size: int) -> np.ndarray:
    """(steps, batch_size) bool marking non-duplicated positions for
    ``pad='repeat_last'`` evaluation plans."""
    steps = -(-n // batch_size)
    mask = np.zeros((steps * batch_size,), dtype=bool)
    mask[:n] = True
    return mask.reshape(steps, batch_size)
