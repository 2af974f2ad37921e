"""Evaluation metric tables and k-fold merging.

Rebuild of ``calculate_metrics`` / ``mergekfold_results``
(src/utils.py:822-1039): regression rows get L1/L2/R2/OLF, classification
rows micro/macro f1-precision-recall-accuracy; rows are dicts keyed by
(Model, Combination, id) suitable for pandas aggregation and the LaTeX
reporter (evaluation/reports.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def calculate_metrics(
    y_true: np.ndarray,
    y_true_label: Optional[np.ndarray],
    y_pred: np.ndarray,
    label: str,
    combination: str,
    id: int,
    task: str = "regression",
):
    """Returns (metrics row, results row). Metric definitions follow
    src/utils.py:880-977; OLF counts |dz|/(1+z) > 0.15."""
    if task == "regression":
        y_true = np.asarray(y_true, dtype=np.float64)
        y_pred = np.asarray(y_pred, dtype=np.float64)
        delta = y_true - y_pred
        ss_tot = np.sum((y_true - y_true.mean()) ** 2)
        metrics = {
            "Model": label,
            "Combination": combination,
            "L1": float(np.mean(np.abs(delta))),
            "L2": float(np.sqrt(np.mean(delta**2))),
            "R2": float(1.0 - np.sum(delta**2) / ss_tot),
            "OLF": float(np.mean(np.abs(delta) / (1.0 + y_true) > 0.15)),
            "id": id,
        }
    elif task == "classification":
        from sklearn.metrics import (
            accuracy_score,
            balanced_accuracy_score,
            f1_score,
            precision_score,
            recall_score,
        )

        yt = np.asarray(y_true_label)
        yp = np.asarray(y_pred)
        metrics = {
            "Model": label,
            "Combination": combination,
            "mic-f1": f1_score(yt, yp, average="micro"),
            "mic-p": precision_score(yt, yp, average="micro"),
            "mic-r": recall_score(yt, yp, average="micro"),
            "mic-acc": accuracy_score(yt, yp),
            "mac-f1": f1_score(yt, yp, average="macro"),
            "mac-p": precision_score(yt, yp, average="macro"),
            "mac-r": recall_score(yt, yp, average="macro"),
            "mac-acc": balanced_accuracy_score(yt, yp),
            "id": id,
        }
    else:
        raise ValueError("task must be 'regression' or 'classification'")

    results = {
        "Model": label,
        "Combination": combination,
        "id": id,
        "y_pred": np.asarray(y_pred),
        "y_true": None if y_true is None else np.asarray(y_true),
        "y_true_label": None if y_true_label is None else np.asarray(y_true_label),
    }
    return metrics, results


def merge_kfold_results(results: List[Dict[str, Any]]):
    """Concatenate predictions/labels across folds grouped by
    (Model, Combination, id) — src/utils.py:980-1039."""
    import pandas as pd

    df = pd.DataFrame(results)
    merged: Dict[str, List[Any]] = {
        k: [] for k in ("Model", "Combination", "id", "y_pred", "y_true", "y_true_label")
    }
    for (model, combo, id_), group in df.groupby(["Model", "Combination", "id"]):
        merged["Model"].append(model)
        merged["Combination"].append(combo)
        merged["id"].append(id_)
        for k in ("y_pred", "y_true", "y_true_label"):
            vals = group[k].dropna().values
            merged[k].append(np.concatenate(vals) if len(vals) else None)
    return pd.DataFrame(merged)


def class_dependent_regression_metrics(
    results: List[Dict[str, Any]], class_names: Dict[int, Any]
) -> List[Dict[str, Any]]:
    """Per-class regression metric rows (for radar plots) — the reference's
    ``get_class_dependent_predictions`` (src/utils.py:1172-1221)."""
    rows = []
    for row in results:
        y_pred = np.asarray(row["y_pred"])
        y_true = np.asarray(row["y_true"])
        labels = np.asarray(row["y_true_label"])
        for label_val, name in class_names.items():
            sel = labels == label_val
            if not sel.any():
                continue
            m, _ = calculate_metrics(
                y_true[sel], labels[sel], y_pred[sel],
                row["Model"], row["Combination"], row["id"], task="regression",
            )
            m["class"] = name[0] if isinstance(name, (tuple, list)) else name
            rows.append(m)
    return rows


def filter_classes_3way(
    embeddings: List[np.ndarray], labels: np.ndarray, extras: Optional[Dict] = None
):
    """Keep 5-way classes {1: SN II, 3: SN Ia, 4: SN Ibc}, remap to 0..2 —
    the reference's 3-way evaluation path (evaluate_models.py:305-313,
    utils.py:1310-1350)."""
    from ..data.transforms import remap_to_three_way

    new_labels, keep = remap_to_three_way(np.asarray(labels))
    new_embs = [e[keep] for e in embeddings]
    new_extras = (
        {k: v[keep] for k, v in extras.items()} if extras is not None else None
    )
    return new_embs, new_labels, new_extras
