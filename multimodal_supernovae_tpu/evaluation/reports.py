"""Reporting: LaTeX tables, ROC-style curves, confusion matrices, scatter
and radar plots (reference: src/utils.py print_metrics_in_latex :693,
plot_ROC_curves :429, save_normalized_conf_matrices :1042, plot_pred_vs_true
:1100, make_spider/generate_radar_plots :1224-1307). Plot functions no-op
gracefully when matplotlib is unavailable."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def metrics_to_latex(
    metrics_list: List[Dict[str, Any]],
    drop: Optional[List[str]] = None,
    sort: Optional[str] = None,
    max_cols_per_table: int = 4,
) -> List[str]:
    """Mean +- std tables grouped by (id, Model, Combination), as LaTeX."""
    import pandas as pd

    df = pd.DataFrame(metrics_list)
    numeric_cols = [c for c in df.columns if df[c].dtype.kind == "f"]
    grouped = df.groupby(["id", "Model", "Combination"])[numeric_cols]
    mean_df, std_df = grouped.mean(), grouped.std()

    tables = []
    for i in range(0, len(numeric_cols), max_cols_per_table):
        cols = numeric_cols[i : i + max_cols_per_table]
        summary = mean_df[cols].copy()
        for c in cols:
            summary[c] = (
                mean_df[c].map("{:.3f}".format) + " ± " + std_df[c].map("{:.3f}".format)
            )
        summary = summary.reset_index().drop(columns="id")
        if drop:
            summary = summary.drop(columns=drop, errors="ignore")
        if sort and sort in summary.columns:
            summary = summary.sort_values(by=sort, ascending=False)
        tables.append(
            summary.to_latex(
                escape=False,
                column_format="|c" * len(summary.columns) + "|",
                index=False,
            )
        )
    return tables


from ..utils.plotting import get_pyplot as _plt


def plot_loss_history(train_hist, val_hist, path_base: str = "./") -> Optional[str]:
    plt = _plt()
    if plt is None:
        return None
    plt.figure(figsize=(10, 6))
    plt.plot(train_hist, label="Training Loss", marker="o")
    plt.plot(val_hist, label="Validation Loss", marker="s")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.7)
    out = os.path.join(path_base, "loss_history.png")
    plt.savefig(out)
    plt.close()
    return out


def plot_retrieval_curves(
    embs_train: List[np.ndarray],
    embs_val: List[np.ndarray],
    combinations: List[str],
    path_base: str = "./",
) -> Optional[str]:
    """Fraction-correct-vs-threshold curves for every modality pair,
    train and val panels (src/utils.py:429-486)."""
    plt = _plt()
    if plt is None:
        return None
    import jax.numpy as jnp

    from ..ops.metrics import retrieval_rank_fractions

    # combinations must be given in the same (canonical) order as the
    # embedding lists — get_embeddings returns both consistently
    combos = list(combinations)
    curves_t, curves_v, labels = [], [], []
    for i in range(len(embs_train) - 1):
        for j in range(i + 1, len(embs_train)):
            th, ft = retrieval_rank_fractions(
                jnp.asarray(embs_train[i]), jnp.asarray(embs_train[j])
            )
            _, fv = retrieval_rank_fractions(
                jnp.asarray(embs_val[i]), jnp.asarray(embs_val[j])
            )
            curves_t.append(np.asarray(ft))
            curves_v.append(np.asarray(fv))
            labels.append(f"{combos[i]} and {combos[j]}")
    th = np.asarray(th)
    plt.figure(figsize=(12, 6))
    for panel, (curves, title) in enumerate(
        [(curves_v, "Validation Data"), (curves_t, "Training Data")]
    ):
        plt.subplot(1, 2, panel + 1)
        for c, l in zip(curves, labels):
            plt.plot(th, c, lw=2, label=l)
        plt.plot(th, th, linestyle="--", color="gray", label="Random")
        plt.title(title)
        plt.xlabel("Threshold")
        plt.ylabel("Fraction Correct")
        plt.legend()
        plt.grid(True, linestyle="--", alpha=0.7)
    out = os.path.join(path_base, "ROC_curves.png")
    plt.tight_layout()
    plt.savefig(out)
    plt.close()
    return out


def plot_confusion_matrices(df, class_names: Dict[int, Tuple[str, str]],
                            output_dir: str = "confusion_matrices"):
    plt = _plt()
    if plt is None:
        return
    from sklearn.metrics import confusion_matrix

    os.makedirs(output_dir, exist_ok=True)
    for _, row in df.iterrows():
        cm = confusion_matrix(row["y_true_label"], row["y_pred"])
        cm = cm.astype(float) / cm.sum(axis=1, keepdims=True)
        fig, ax = plt.subplots(figsize=(8, 6))
        im = ax.imshow(cm, cmap="Blues", vmin=0, vmax=1)
        ticks = [class_names[k][0] for k in sorted(class_names)]
        ax.set_xticks(range(len(ticks)), ticks)
        ax.set_yticks(range(len(ticks)), ticks)
        for a in range(cm.shape[0]):
            for b in range(cm.shape[1]):
                ax.text(b, a, f"{cm[a, b]:.2f}", ha="center", va="center")
        ax.set_xlabel("Predicted Label")
        ax.set_ylabel("True Label")
        fig.colorbar(im)
        name = f"{row['Model']}_{row['Combination']}.png".replace(" ", "")
        fig.savefig(os.path.join(output_dir, name))
        plt.close(fig)


def plot_pred_vs_true(df, folder: str, class_names: Dict[int, Tuple[str, str]]):
    plt = _plt()
    if plt is None:
        return
    os.makedirs(folder, exist_ok=True)
    for _, row in df.iterrows():
        y_pred, y_true = np.asarray(row["y_pred"]), np.asarray(row["y_true"])
        labels = np.asarray(row["y_true_label"])
        uniq = np.unique(labels)
        fig, axes = plt.subplots(len(uniq), 1, figsize=(8, 4 * len(uniq)))
        axes = np.atleast_1d(axes)
        for ax, lab in zip(axes, uniq):
            ax.scatter(y_true, y_pred, color="gray", alpha=0.2)
            sel = labels == lab
            name, color = class_names[int(lab)]
            ax.scatter(y_true[sel], y_pred[sel], color=color, label=name)
            lim = np.linspace(-1, 1, 10)
            ax.plot(lim, lim, "r--", alpha=0.5)
            ax.set_xlim(0, max(0.01, y_true.max()))
            ax.set_ylim(min(0, y_pred.min()), max(0.01, y_pred.max()))
            ax.set_xlabel("True Redshift")
            ax.set_ylabel("Predicted Redshift")
            ax.legend()
        name = f"{row['Model']}_{row['Combination']}.png".replace(" ", "")
        fig.savefig(os.path.join(folder, name))
        plt.close(fig)


def radar_plot(df, title: str, metric: str, output_dir: str,
               value_range: Optional[Tuple[float, float]] = None):
    plt = _plt()
    if plt is None:
        return
    cats = df["class"].tolist()
    vals = df[metric].tolist()
    angles = np.linspace(0, 2 * np.pi, len(cats), endpoint=False).tolist()
    angles += angles[:1]
    vals += vals[:1]
    fig, ax = plt.subplots(figsize=(6, 6), subplot_kw=dict(polar=True))
    ax.fill(angles, vals, alpha=0.25)
    ax.plot(angles, vals, lw=2)
    if value_range:
        ax.set_ylim(*value_range)
    ax.set_xticks(angles[:-1], cats)
    plt.title(f"{title} - {metric}")
    os.makedirs(output_dir, exist_ok=True)
    fig.savefig(os.path.join(output_dir, f"{title}_{metric}.png".replace(" ", "_")))
    plt.close(fig)
