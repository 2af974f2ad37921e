#!/usr/bin/env python
"""Batch inference / embedding export for trained runs — the serving path.

Loads any run directory this framework can restore (its own orbax runs AND
the reference's PyTorch-Lightning run dirs, via models/factory.py), streams
a dataset through the frozen model as jitted fixed-shape scans, and writes
one ``.npz`` artifact plus a JSON manifest:

  * contrastive CLIP runs  -> L2-normalised per-modality embeddings
    (``emb_<modality>`` arrays), ready for retrieval / probes / indexing;
  * supervised runs        -> ``pred`` (regression value or class logits)
    and ``pred_class`` for classification;
  * masked-pretrain runs   -> ``recon_mse`` per-sample reconstruction error
    on a seeded random masked span (an anomaly score).

The reference has no batch-inference entry point (its closest path is the
eval driver's embedding pass, evaluate_models.py:269-303); this CLI is the
deployment-facing complement of scripts/evaluate.py.

  python scripts/infer.py analysis/maven-lite/run-0 --data-dir ZTFBTS/ \
      --spectra-dir ZTFBTS_spectra/ --out run0_embeddings.npz --split val
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="trained run directory (ours or reference)")
    ap.add_argument("--data-dir", default=None, help="ZTFBTS root")
    ap.add_argument("--spectra-dir", default=None)
    ap.add_argument("--hdf5", default=None,
                    help="simulation corpus instead of real data")
    ap.add_argument("--cache-dir", default="./data_cache")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--split", choices=["all", "train", "val"], default="all",
                    help="restrict to the run's own split manifest")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--which", choices=["best", "last"], default="best")
    ap.add_argument("--seed", type=int, default=0,
                    help="mask seed for masked-model anomaly scores")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax

    from multimodal_supernovae_tpu.data.cache import load_or_ingest
    from multimodal_supernovae_tpu.data.simulation import ingest_simulation
    from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts
    from multimodal_supernovae_tpu.evaluation.embeddings import (
        get_embeddings,
        masked_reconstruction_mse,
        predict_supervised,
    )
    from multimodal_supernovae_tpu.models.factory import (
        load_model,
        load_run_config,
    )
    from multimodal_supernovae_tpu.models.pretraining import (
        MaskedLightCurveEncoder,
    )
    from multimodal_supernovae_tpu.utils.io import get_valid_dir, is_subset

    run_cfg, extra = load_run_config(args.run_dir)
    combinations = tuple(extra.get("combinations", ("lightcurve",)))

    # ---- dataset ---------------------------------------------------------
    if args.hdf5:
        dataset = ingest_simulation(
            args.hdf5,
            bands=("r", "g") if int(extra.get("nband", 2)) == 2 else ("r",),
            n_max_obs=int(extra.get("max_lightcurve_data_len", 100)),
            n_max_obs_spec=int(extra.get("max_spectral_data_len", 220)),
            combinations=combinations,
        )
    else:
        data_dir = args.data_dir or get_valid_dir(
            ["ZTFBTS/", "data/ZTFBTS/", "../data/ZTFBTS/"]
        )
        spectra_dir = args.spectra_dir
        ingest_config = dict(
            data_dir=data_dir,
            spectra_dir=spectra_dir,
            combinations=combinations,
            max_data_len_lc=int(extra.get("max_lightcurve_data_len", 100)),
            max_data_len_spec=int(extra.get("max_spectral_data_len", 1000)),
            n_classes=int(extra.get("n_classes", 5)),
            spectral_rescalefactor=float(
                extra.get("spectral_rescalefactor", 1e14)
            ),
        )

        def ingest():
            ds, _, _ = load_ztfbts(kfolds=None, **ingest_config)
            return ds

        dataset, _ = load_or_ingest(args.cache_dir, ingest, **ingest_config)

    example = dataset.host_batch(np.arange(min(4, len(dataset))))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        args.run_dir, example, which=args.which
    )

    if args.split != "all":
        names = train_names if args.split == "train" else val_names
        if not names:
            ap.error(f"run has no {args.split} manifest")
        if dataset.filenames is None or not is_subset(names, dataset.filenames):
            ap.error(f"{args.split} manifest entries missing from the dataset")
        dataset = dataset.subset_by_filenames(names)
    print(f"dataset: {len(dataset)} samples; model: {type(model).__name__}")

    # ---- inference -------------------------------------------------------
    arrays = {}
    manifest = {
        "run_dir": os.path.abspath(args.run_dir),
        "checkpoint": args.which,
        "n_samples": len(dataset),
        "split": args.split,
        "combinations": list(combinations),
        "backend": jax.default_backend(),
    }

    if isinstance(model, MaskedLightCurveEncoder):
        arrays["recon_mse"] = masked_reconstruction_mse(
            model, variables, dataset, jax.random.PRNGKey(args.seed),
            batch_size=args.batch_size,
        )
        manifest["task"] = "masked_anomaly_score"
    elif getattr(model.cfg, "supervised", False) or type(model).__name__ == "ClipMLPHead":
        preds = predict_supervised(model, variables, dataset,
                                   batch_size=args.batch_size)
        arrays["pred"] = preds
        if preds.shape[-1] > 1:  # classification logits
            arrays["pred_class"] = preds.argmax(axis=-1)
            manifest["task"] = "classification"
        else:
            manifest["task"] = "regression"
    else:
        embs, names = get_embeddings(model, variables, dataset,
                                     batch_size=args.batch_size)
        for e, nm in zip(embs, names):
            arrays[f"emb_{nm}"] = e
        manifest["task"] = "contrastive_embeddings"
        manifest["embedding_dim"] = int(embs[0].shape[-1])

    if dataset.filenames is not None:
        arrays["filenames"] = np.asarray(dataset.filenames)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **arrays)
    with open(os.path.splitext(args.out)[0] + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()
