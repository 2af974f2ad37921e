"""Train/val splitting: random fraction or stratified k-fold.

Reproduces the reference's two split modes (script_wandb.py:44-52):
``train_test_split(range(n), test_size=val_fraction, random_state=seed)``
and sklearn ``StratifiedKFold(n_splits=kfolds)`` stratified on the class
labels (dataloader.py:893-903). sklearn is used directly — these run once
per experiment on host, never in the compute path — keeping fold membership
bit-identical to the reference for a given seed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
from sklearn.model_selection import StratifiedKFold, train_test_split


def stratified_kfolds(labels: np.ndarray, kfolds: int = 5) -> List[Dict[str, np.ndarray]]:
    """List of {'train_indices', 'test_indices'} dicts, one per fold."""
    skf = StratifiedKFold(n_splits=kfolds)
    return [
        {"train_indices": tr, "test_indices": te}
        for tr, te in skf.split(labels, labels)
    ]


def random_split(
    n: int, val_fraction: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Random train/val index split with sklearn's RNG semantics."""
    inds_train, inds_val = train_test_split(
        np.arange(n), test_size=val_fraction, random_state=seed
    )
    return np.asarray(inds_train), np.asarray(inds_val)


def split_for_run(
    n: int,
    val_fraction: float,
    seed: int,
    folds: Optional[List[Dict[str, np.ndarray]]] = None,
    foldnumber: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """The per-run split rule of train_sweep (script_wandb.py:44-52):
    fold indices when a stratified fold plan exists, else a random split."""
    if folds is not None and foldnumber is not None:
        f = folds[foldnumber]
        return np.asarray(f["train_indices"]), np.asarray(f["test_indices"])
    return random_split(n, val_fraction, seed)
