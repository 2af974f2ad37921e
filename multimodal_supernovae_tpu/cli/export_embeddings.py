#!/usr/bin/env python
"""Export frozen embeddings for a dataset from a trained run.

Part of the public API surface (embedding export): writes one .npz with
per-modality embeddings, the row filenames, redshifts and labels — the
hand-off format for downstream probes/catalogues.

  python scripts/export_embeddings.py --run analysis/maven-lite/run-0 \
      --data-dir ZTFBTS/ --spectra-dir ZTFBTS_spectra/ --out embs.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--spectra-dir", default=None)
    ap.add_argument("--out", default="embeddings.npz")
    ap.add_argument("--split", choices=["all", "train", "val"], default="all",
                    help="restrict to the run's own split manifest")
    ap.add_argument("--which", choices=["best", "last"], default="best")
    ap.add_argument("--max-lc-len", type=int, default=100)
    ap.add_argument("--max-spec-len", type=int, default=1024)
    ap.add_argument("--rescale", type=float, default=1.0)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts
    from multimodal_supernovae_tpu.evaluation.embeddings import get_embeddings
    from multimodal_supernovae_tpu.models.factory import load_model

    dataset, _, _ = load_ztfbts(
        args.data_dir,
        args.spectra_dir,
        combinations=("lightcurve", "spectral"),
        max_data_len_lc=args.max_lc_len,
        max_data_len_spec=args.max_spec_len,
        spectral_rescalefactor=args.rescale,
        kfolds=None,
    )
    example = dataset.host_batch(np.arange(min(4, len(dataset))))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        args.run, example, which=args.which
    )
    if args.split == "train":
        dataset = dataset.subset_by_filenames(train_names)
    elif args.split == "val":
        dataset = dataset.subset_by_filenames(val_names)

    embs, names = get_embeddings(
        model, variables, dataset, batch_size=args.batch_size
    )
    payload = {f"emb_{n}": e for n, e in zip(names, embs)}
    payload["filenames"] = np.asarray(dataset.filenames)
    payload["redshift"] = dataset.arrays["redshift"]
    payload["label"] = dataset.arrays["label"]
    np.savez(args.out, **payload)
    print(
        f"wrote {args.out}: {len(dataset)} rows x "
        f"{[(n, e.shape[1]) for n, e in zip(names, embs)]}"
    )


if __name__ == "__main__":
    main()
