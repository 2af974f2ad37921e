"""Linear / KNN probes on frozen embeddings.

The reference probes frozen embeddings with sklearn LinearRegression,
LinearSVC, and KNeighbors{Regressor,Classifier} (src/utils.py:489-586,
evaluate_models.py:35). Probing happens once per evaluation on tiny matrices
(<= ~5k x 256); sklearn on host matches the reference bit-for-bit and is
nowhere near the bottleneck, so it is used directly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

DEFAULT_KNN_KS = (1, 2, 3, 5, 7, 8, 9)  # evaluate_models.py:35


def linear_probe(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_val: Optional[np.ndarray] = None,
    task: str = "regression",
) -> np.ndarray:
    """Fit LinearRegression (regression) or LinearSVC (classification) on
    train embeddings; predict on val (or train when no val given)."""
    from sklearn.linear_model import LinearRegression
    from sklearn.svm import LinearSVC

    y = np.asarray(y_train)
    if y.ndim == 1:
        y = y[:, None]
    if task == "regression":
        model = LinearRegression().fit(x_train, y)
    elif task == "classification":
        model = LinearSVC().fit(x_train, y.ravel())
    else:
        raise ValueError(f"unknown task {task}")
    return np.asarray(model.predict(x_val if x_val is not None else x_train)).ravel()


def knn_probe(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_val: Optional[np.ndarray] = None,
    k: int = 5,
    task: str = "regression",
) -> np.ndarray:
    from sklearn.neighbors import KNeighborsClassifier, KNeighborsRegressor

    y = np.asarray(y_train)
    if y.ndim == 1:
        y = y[:, None]
    cls = KNeighborsRegressor if task == "regression" else KNeighborsClassifier
    k = min(k, len(x_train))  # tiny datasets: clamp rather than crash
    model = cls(n_neighbors=k).fit(x_train, y if task == "regression" else y.ravel())
    return np.asarray(model.predict(x_val if x_val is not None else x_train)).ravel()
