#!/usr/bin/env python
"""Batch evaluation of trained runs: probes on frozen embeddings.

Rebuild of ``evaluate_models.py``: walks run directories, reloads each model
with its exact train/val split manifests, extracts embeddings, fits Linear +
KNN probes (single and concatenated-pair modality inputs) for redshift
regression and 5-way/3-way classification, and writes metric pickles, LaTeX
tables and plots.

  python scripts/evaluate.py --runs analysis/maven-lite/run-0 \
      --label Maven-lite --data-dir ZTFBTS/ --spectra-dir ZTFBTS_spectra/
"""

from __future__ import annotations

import argparse
import itertools
import os
import pickle
import sys

import numpy as np


KNN_KS = (1, 2, 3, 5, 7, 8, 9)  # evaluate_models.py:35

# 5-way class names + plot colors (sorted factorize order)
CLASS_NAMES_5 = {
    0: ("SLSN-I", "tab:purple"),
    1: ("SN II", "tab:blue"),
    2: ("SN IIn", "tab:cyan"),
    3: ("SN Ia", "tab:orange"),
    4: ("SN Ibc", "tab:green"),
}
CLASS_NAMES_3 = {
    0: ("SN II", "tab:blue"),
    1: ("SN Ia", "tab:orange"),
    2: ("SN Ibc", "tab:green"),
}


def evaluate_run(run_dir, label, run_id, dataset, out):
    """Probe one run: embeddings from its exact val split, Linear/KNN probes
    on single + paired modality embeddings, both 5-way and 3-way. Supervised
    (regression/classification) runs are scored on their own head
    predictions instead (the reference's process_data_loader path,
    utils.py:608-691, evaluate_models.py:211-267)."""
    from multimodal_supernovae_tpu.evaluation.embeddings import (
        get_embeddings,
        predict_supervised,
    )
    from multimodal_supernovae_tpu.evaluation.metrics import (
        calculate_metrics,
        filter_classes_3way,
    )
    from multimodal_supernovae_tpu.evaluation.probes import knn_probe, linear_probe
    from multimodal_supernovae_tpu.models.factory import load_model
    from multimodal_supernovae_tpu.utils.io import is_subset

    example = dataset.host_batch(np.arange(min(4, len(dataset))))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        run_dir, example
    )
    assert is_subset(train_names, dataset.filenames), "train split not in dataset"
    assert is_subset(val_names, dataset.filenames), "val split not in dataset"
    train_ds = dataset.subset_by_filenames(train_names)
    val_ds = dataset.subset_by_filenames(val_names)

    if model.cfg.supervised:
        preds = predict_supervised(model, variables, val_ds)
        combo = " ".join(model.cfg.combinations)
        if model.cfg.regression:
            m, r = calculate_metrics(
                val_ds.arrays["redshift"], val_ds.arrays["label"], preds[:, 0],
                label, combo, run_id, task="regression",
            )
            out["regression"].append(m)
            out["regression_results"].append(r)
        else:
            m, r = calculate_metrics(
                None, val_ds.arrays["label"], preds.argmax(axis=-1),
                label, combo, run_id, task="classification",
            )
            out["classification"].append(m)
            out["classification_results"].append(r)
        return

    embs_train, names = get_embeddings(model, variables, train_ds)
    embs_val, _ = get_embeddings(model, variables, val_ds)

    # single modalities + concatenated pairs (evaluate_models.py:269-503)
    inputs = {}
    for i, n in enumerate(names):
        inputs[n] = (embs_train[i], embs_val[i])
    for i, j in itertools.combinations(range(len(names)), 2):
        inputs[f"{names[i]}+{names[j]}"] = (
            np.concatenate([embs_train[i], embs_train[j]], axis=1),
            np.concatenate([embs_val[i], embs_val[j]], axis=1),
        )

    z_tr, z_va = train_ds.arrays["redshift"], val_ds.arrays["redshift"]
    y_tr, y_va = train_ds.arrays["label"], val_ds.arrays["label"]

    for combo, (xt, xv) in inputs.items():
        # regression probes
        pred = linear_probe(xt, z_tr, xv, task="regression")
        m, r = calculate_metrics(z_va, y_va, pred, f"{label}+Linear", combo,
                                 run_id, task="regression")
        out["regression"].append(m)
        out["regression_results"].append(r)
        for k in KNN_KS:
            pred = knn_probe(xt, z_tr, xv, k=k, task="regression")
            m, r = calculate_metrics(z_va, y_va, pred, f"{label}+KNN{k}",
                                     combo, run_id, task="regression")
            out["regression"].append(m)
            out["regression_results"].append(r)

        # classification probes: 5-way, then 3-way remap
        for tag, (xt_c, yt_c, xv_c, yv_c) in {
            "five": (xt, y_tr, xv, y_va),
            "three": _three_way(xt, y_tr, xv, y_va),
        }.items():
            if xt_c is None:
                continue
            pred = linear_probe(xt_c, yt_c, xv_c, task="classification")
            m, r = calculate_metrics(None, yv_c, pred, f"{label}+Linear-{tag}",
                                     combo, run_id, task="classification")
            out["classification"].append(m)
            out["classification_results"].append(r)
            for k in KNN_KS:
                pred = knn_probe(xt_c, yt_c, xv_c, k=k, task="classification")
                m, r = calculate_metrics(None, yv_c, pred,
                                         f"{label}+KNN{k}-{tag}",
                                         combo, run_id, task="classification")
                out["classification"].append(m)
                out["classification_results"].append(r)


def _three_way(xt, yt, xv, yv):
    from multimodal_supernovae_tpu.evaluation.metrics import filter_classes_3way

    (xt3,), yt3, _ = filter_classes_3way([xt], yt)
    (xv3,), yv3, _ = filter_classes_3way([xv], yv)
    if len(yt3) == 0 or len(yv3) == 0 or len(np.unique(yt3)) < 2:
        return None, None, None, None
    return xt3, yt3, xv3, yv3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="+", required=True,
                    help="run directories (each: <sweep>/<run>)")
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--spectra-dir", default=None)
    ap.add_argument("--out-dir", default="evaluation_metrics")
    ap.add_argument("--max-lc-len", type=int, default=100)
    ap.add_argument("--max-spec-len", type=int, default=1024)
    ap.add_argument("--rescale", type=float, default=1.0)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX backend (overrides env/sitecustomize)")
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts
    from multimodal_supernovae_tpu.evaluation.metrics import merge_kfold_results
    from multimodal_supernovae_tpu.evaluation.reports import (
        metrics_to_latex,
        plot_confusion_matrices,
        plot_pred_vs_true,
    )

    dataset, _, _ = load_ztfbts(
        args.data_dir,
        args.spectra_dir,
        combinations=("lightcurve", "spectral"),
        max_data_len_lc=args.max_lc_len,
        max_data_len_spec=args.max_spec_len,
        spectral_rescalefactor=args.rescale,
        kfolds=None,
    )

    labels = args.labels or [os.path.basename(os.path.dirname(r)) for r in args.runs]
    out = {"regression": [], "classification": [],
           "regression_results": [], "classification_results": []}
    for run_id, (run_dir, label) in enumerate(zip(args.runs, labels)):
        print(f"evaluating {run_dir} as {label}")
        evaluate_run(run_dir, label, run_id, dataset, out)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "regression_metrics_list.pkl"), "wb") as f:
        pickle.dump(out["regression"], f)
    with open(os.path.join(args.out_dir, "classification_metrics_list.pkl"), "wb") as f:
        pickle.dump(out["classification"], f)

    for table in metrics_to_latex(out["regression"], sort="R2"):
        print(table)
    if out["classification"]:
        for table in metrics_to_latex(out["classification"], sort="mac-f1"):
            print(table)

    merged = merge_kfold_results(out["classification_results"])
    plot_confusion_matrices(merged, CLASS_NAMES_5,
                            os.path.join(args.out_dir, "confusion_matrices"))
    merged_reg = merge_kfold_results(out["regression_results"])
    plot_pred_vs_true(merged_reg, os.path.join(args.out_dir, "pred_vs_true"),
                      CLASS_NAMES_5)

    # per-class radar plots (utils.py:1172-1307 equivalent)
    from multimodal_supernovae_tpu.evaluation.metrics import (
        class_dependent_regression_metrics,
    )
    from multimodal_supernovae_tpu.evaluation.reports import radar_plot

    per_class = class_dependent_regression_metrics(
        merged_reg.to_dict("records"), CLASS_NAMES_5
    )
    if per_class:
        import pandas as pd

        df = pd.DataFrame(per_class)
        radar_dir = os.path.join(args.out_dir, "radar")
        for (model, combo), group in df.groupby(["Model", "Combination"]):
            for metric in ("L1", "L2", "R2", "OLF"):
                radar_plot(group, f"{model} - {combo}", metric, radar_dir)
    print(f"wrote metrics to {args.out_dir}")


if __name__ == "__main__":
    main()
