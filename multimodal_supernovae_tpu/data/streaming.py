"""Streaming/sharded ingest for corpora larger than HBM (or host RAM).

The materialise-everything path (data/cache.py) is right for the reference's
real dataset (~4.7k SNe) and its 0.5M-light-curve sim corpus, but a corpus
that outgrows HBM needs a different shape. The reference streams per ITEM —
``SimulationDataset.__getitem__`` re-opens the HDF5 group and re-processes
one transient per fetch (src/dataloader.py:1037-1229), paying parse +
extinction + pad work on every epoch. Here the streaming unit is a SHARD:

  ingest (once):  HDF5 group chunks -> fixed-size cache shards on disk
                  (each a dir of .npy files; vectorized preprocessing runs
                  once per row ever, not once per epoch)
  train (epochs): shuffled shard order -> at most two shards resident in
                  HBM (double-buffered upload/compute overlap, dropping to
                  one when two don't fit) -> the SAME jitted epoch scan as
                  the in-memory path runs over each shard's step plan

Shuffling is two-level (shard order + rows within shard), the standard
sharded-corpus compromise; with rows_per_shard >> batch the mixing is
empirically indistinguishable for contrastive training. All shards except
possibly the last have identical row counts, so every shard reuses one
compiled epoch program (static shapes; the tail shard wraps to full step
count like the in-memory path's pad="wrap").
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from .batching import ArrayDataset, epoch_indices

MANIFEST = "stream_manifest.json"


# ---------------------------------------------------------------------------
# Writer: chunk iterator -> fixed-size shards
# ---------------------------------------------------------------------------


def write_sharded_cache(
    cache_dir: str,
    chunks: Iterator[Dict[str, np.ndarray]],
    rows_per_shard: int,
) -> "ShardedDataset":
    """Re-bucket an iterator of dict-of-array chunks into equal-size shards.

    Peak host memory is O(rows_per_shard + max single chunk), independent of
    corpus size. Field dtypes/trailing shapes must be consistent across
    chunks (they are, by construction, for the canonical batch fields).
    """
    os.makedirs(cache_dir, exist_ok=True)
    buf: Dict[str, List[np.ndarray]] = {}
    buffered = 0
    shard_sizes: List[int] = []
    fields: Optional[List[str]] = None

    def flush(n_rows: int) -> None:
        nonlocal buf, buffered
        take = {k: [] for k in buf}
        left = n_rows
        while left > 0:
            head = buf_first_len()
            if head <= left:
                for k in buf:
                    take[k].append(buf[k].pop(0))
                left -= head
            else:  # split the front chunk
                for k in buf:
                    take[k].append(buf[k][0][:left])
                    buf[k][0] = buf[k][0][left:]
                left = 0
        shard = {k: np.concatenate(v, axis=0) for k, v in take.items()}
        idx = len(shard_sizes)
        path = os.path.join(cache_dir, f"shard_{idx:05d}")
        os.makedirs(path, exist_ok=True)
        for k, v in shard.items():
            np.save(os.path.join(path, f"{k}.npy"), v)
        shard_sizes.append(n_rows)
        buffered -= n_rows

    def buf_first_len() -> int:
        k = next(iter(buf))
        return len(buf[k][0])

    for chunk in chunks:
        if fields is None:
            fields = sorted(chunk)
        if sorted(chunk) != fields:
            raise ValueError(f"chunk fields {sorted(chunk)} != {fields}")
        n = len(next(iter(chunk.values())))
        for k, v in chunk.items():
            if len(v) != n:
                raise ValueError(f"ragged chunk: field {k} has {len(v)} rows != {n}")
            buf.setdefault(k, []).append(np.asarray(v))
        buffered += n
        while buffered >= rows_per_shard:
            flush(rows_per_shard)
    if buffered > 0:
        flush(buffered)
    if fields is None:
        raise ValueError("empty chunk iterator")

    manifest = {
        "fields": fields,
        "rows_per_shard": rows_per_shard,
        "shard_sizes": shard_sizes,
        "n": int(sum(shard_sizes)),
    }
    with open(os.path.join(cache_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return ShardedDataset(cache_dir)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


class ShardedDataset:
    """Lazy view over a sharded cache: loads ONE shard at a time (mmap)."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.cache_dir = cache_dir
        self.fields: List[str] = self.manifest["fields"]
        self.shard_sizes: List[int] = self.manifest["shard_sizes"]

    def __len__(self) -> int:
        return self.manifest["n"]

    @property
    def n_shards(self) -> int:
        return len(self.shard_sizes)

    def load_shard(self, i: int, mmap: bool = True) -> ArrayDataset:
        path = os.path.join(self.cache_dir, f"shard_{i:05d}")
        arrays = {
            k: np.load(os.path.join(path, f"{k}.npy"),
                       mmap_mode="r" if mmap else None)
            for k in self.fields
        }
        return ArrayDataset(arrays, None)

    def materialize(self) -> ArrayDataset:
        """Concatenate all shards (tests / small corpora only)."""
        shards = [self.load_shard(i, mmap=False) for i in range(self.n_shards)]
        return ArrayDataset(
            {k: np.concatenate([s.arrays[k] for s in shards], axis=0)
             for k in self.fields},
            None,
        )


class ValHoldout:
    """Carve an in-memory validation split out of a streamed chunk iterator.

    The streaming trainer keeps validation HBM-resident (it is small and
    evaluated every epoch) while the training corpus stays sharded on disk.
    ``wrap`` routes a deterministic random fraction of every chunk's rows to
    an internal buffer (capped at ``cap`` rows — beyond that the fraction of
    later chunks is passed through untouched) and yields the remainder for
    the shard writer. The same seed reproduces the same split.
    """

    def __init__(self, val_fraction: float, seed: int = 0, cap: int = 50000):
        if not 0.0 < val_fraction < 1.0:
            raise ValueError(f"val_fraction must be in (0, 1): {val_fraction}")
        self.val_fraction = val_fraction
        self.cap = cap
        self._rng = np.random.default_rng(seed)
        self._parts: List[Dict[str, np.ndarray]] = []
        self._n = 0

    def wrap(self, chunks: Iterator[Dict[str, np.ndarray]]):
        for chunk in chunks:
            n = len(next(iter(chunk.values())))
            take = self._rng.random(n) < self.val_fraction
            if self._n >= self.cap:
                take[:] = False
            elif self._n + int(take.sum()) > self.cap:
                extra = self._n + int(take.sum()) - self.cap
                on = np.flatnonzero(take)
                take[on[len(on) - extra:]] = False
            if take.any():
                self._parts.append({k: np.asarray(v[take]) for k, v in chunk.items()})
                self._n += int(take.sum())
            keep = ~take
            if keep.any():
                yield {k: v[keep] for k, v in chunk.items()}

    def dataset(self) -> ArrayDataset:
        if not self._parts:
            raise ValueError("no validation rows collected — iterate wrap() first")
        arrays = {
            k: np.concatenate([p[k] for p in self._parts], axis=0)
            for k in self._parts[0]
        }
        return ArrayDataset(arrays, None)


def save_val_split(cache_dir: str, val_ds: ArrayDataset) -> None:
    """Persist the held-out validation split next to the shard cache so a
    reused cache reproduces the identical split."""
    path = os.path.join(cache_dir, "val")
    os.makedirs(path, exist_ok=True)
    for k, v in val_ds.arrays.items():
        np.save(os.path.join(path, f"{k}.npy"), np.asarray(v))


def load_val_split(cache_dir: str) -> Optional[ArrayDataset]:
    path = os.path.join(cache_dir, "val")
    if not os.path.isdir(path):
        return None
    arrays = {
        f[:-4]: np.load(os.path.join(path, f))
        for f in sorted(os.listdir(path))
        if f.endswith(".npy")
    }
    return ArrayDataset(arrays, None)


def shard_epoch_schedule(
    ds: ShardedDataset,
    batch_size: int,
    rng: np.random.Generator,
) -> List[tuple]:
    """One epoch's (shard_index, step_plan) list: shuffled shard order, each
    shard's rows shuffled, every plan padded (wrap) to the FULL shard's step
    count so one compiled program serves all equal-size shards."""
    steps_full = -(-ds.shard_sizes[0] // batch_size)
    order = rng.permutation(ds.n_shards)
    schedule = []
    for si in order:
        plan = epoch_indices(
            ds.shard_sizes[si], batch_size, rng=rng, shuffle=True, pad="wrap"
        )
        if plan.shape[0] < steps_full:  # tail shard: wrap to full length
            reps = -(-steps_full // plan.shape[0])
            plan = np.concatenate([plan] * reps, axis=0)[:steps_full]
        schedule.append((int(si), plan))
    return schedule
