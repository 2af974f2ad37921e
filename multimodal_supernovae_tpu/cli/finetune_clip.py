#!/usr/bin/env python
"""CLIP fine-tuning on real data from a sim-pretrained checkpoint.

Rebuild of ``finetune_clip.py``: builds the model from the PRETRAINED run's
config (initialize_model path, models_multimodal.py:583-680), loads its
weights non-strictly, optionally freezes both sequence encoders except their
projections, then continues CLIP training on ZTF BTS — or, for regression/
classification, wraps the frozen CLIP in an MLP head (ClipMLP).

  python scripts/finetune_clip.py configs/maven_finetune.yaml
"""

from __future__ import annotations

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--analysis-path", default="./analysis")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--spectra-dir", default=None)
    ap.add_argument("--cache-dir", default="./data_cache")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-runs", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="restore each run's ckpt_last and continue; "
                         "completed runs (summary.json present) are skipped")
    ap.add_argument("--parallel-folds", action="store_true",
                    help="train grid points that differ only in foldnumber "
                         "as ONE vmapped program (the reference's 5-fold "
                         "finetune recipe: 1.37x step speedup + one compile "
                         "instead of five; training/ensemble.py)")
    ap.add_argument("--parallel-members", action="store_true",
                    help="like --parallel-folds but also stacks grid points "
                         "differing in seed or lr (per-member seeds/lrs)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX backend (overrides env/sitecustomize)")
    from multimodal_supernovae_tpu.parallel.distributed import (
        add_mesh_args,
        mesh_from_args,
    )
    from multimodal_supernovae_tpu.training.preflight import add_check_args

    add_mesh_args(ap)
    add_check_args(ap)
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    # --check needs no device: stay on CPU so the TPU is never claimed
    select_platform(args.platform or ("cpu" if args.check else None))

    if args.check:
        from multimodal_supernovae_tpu.config import load_sweep
        from multimodal_supernovae_tpu.models.factory import (
            finetune_model_builder,
        )
        from multimodal_supernovae_tpu.training.preflight import run_cli_check

        sweep = load_sweep(args.config)
        extra = sweep.extra_args
        # validates the pretrained run dir too: the builder reads its
        # config and weights, and the preflight counts matched leaves
        sys.exit(run_cli_check(
            sweep,
            nband=2,
            lc_len=2 * int(extra.get("max_lightcurve_data_len", 100)),
            sp_len=int(extra.get("max_spectral_data_len", 220)),
            args=args,
            model_builder=finetune_model_builder(extra),
        ))
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    mesh = mesh_from_args(args)

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.cache import load_or_ingest
    from multimodal_supernovae_tpu.data.folds import stratified_kfolds
    from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts
    from multimodal_supernovae_tpu.models.factory import finetune_model_builder
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )
    from multimodal_supernovae_tpu.utils.io import get_valid_dir

    sweep = load_sweep(args.config)
    extra = sweep.extra_args
    name = os.path.splitext(os.path.basename(args.config))[0]
    sweep_dir = make_sweep_dir(sweep, args.analysis_path, name)

    combinations = tuple(extra["combinations"])
    data_dir = args.data_dir or get_valid_dir(["ZTFBTS/", "data/ZTFBTS/"])
    spectra_dir = args.spectra_dir
    if spectra_dir is None and "spectral" in combinations:
        spectra_dir = get_valid_dir(["ZTFBTS_spectra/", "data/ZTFBTS_spectra/"])

    ingest_config = dict(
        data_dir=data_dir,
        spectra_dir=spectra_dir,
        combinations=combinations,
        max_data_len_lc=int(extra.get("max_lightcurve_data_len", 100)),
        max_data_len_spec=int(extra.get("max_spectral_data_len", 220)),
        n_classes=int(extra.get("n_classes", 5)),
        spectral_rescalefactor=float(extra.get("spectral_rescalefactor", 1e14)),
    )
    dataset, _ = load_or_ingest(
        args.cache_dir,
        lambda: load_ztfbts(kfolds=None, **ingest_config)[0],
        **ingest_config,
    )
    kfolds = extra.get("kfolds")
    folds = stratified_kfolds(dataset.arrays["label"], kfolds) if kfolds else None

    results = run_sweep(
        sweep, dataset, nband=2, folds=folds, sweep_dir=sweep_dir,
        model_builder=finetune_model_builder(extra),
        use_wandb=args.wandb,
        max_runs=args.max_runs or extra.get("nruns"),
        epochs_override=args.epochs,
        mesh=mesh,
        resume=args.resume,
        parallel_folds=args.parallel_folds,
        parallel_members=args.parallel_members,
    )
    for r in results:
        print(f"{r['run_dir']}: best {r['best']}")


if __name__ == "__main__":
    main()
