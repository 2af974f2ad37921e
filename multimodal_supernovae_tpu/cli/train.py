#!/usr/bin/env python
"""Train CLIP / supervised heads on real ZTF BTS data.

The rebuild of the reference's ``script_wandb.py`` CLI: one positional
argument — a sweep-format YAML (or an existing sweep directory under
``analysis/`` to continue). Loads the dataset once, then trains every grid
point, writing the reference's run-directory contract (sweep_config.yaml,
per-run config.yaml + split manifests + checkpoints + metrics).

  python scripts/train.py configs/maven-lite.yaml
  python scripts/train.py analysis/maven-lite       # continue a sweep
"""

from __future__ import annotations

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="sweep YAML path or existing sweep dir")
    ap.add_argument("--analysis-path", default="./analysis")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--spectra-dir", default=None)
    ap.add_argument("--cache-dir", default="./data_cache")
    ap.add_argument("--epochs", type=int, default=None, help="override epochs")
    ap.add_argument("--max-runs", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="restore each run's ckpt_last and continue training")
    ap.add_argument("--parallel-folds", action="store_true",
                    help="train grid points that differ only in foldnumber "
                         "as ONE vmapped program (5 folds @ batch 32: 1.37x "
                         "step speedup + one compile instead of five; "
                         "training/ensemble.py)")
    ap.add_argument("--parallel-members", action="store_true",
                    help="like --parallel-folds but also stacks grid points "
                         "differing in seed or lr (per-member seeds/lrs — a "
                         "seed ensemble or the reference's lr grid runs as "
                         "one program)")
    ap.add_argument("--profile-dir", default=None,
                    help="capture an XLA profiler trace of training here")
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
        from multimodal_supernovae_tpu.training.preflight import run_cli_check

        cfg_path = (
            os.path.join(args.config, "sweep_config.yaml")
            if os.path.isdir(args.config)
            else args.config
        )
        sweep = load_sweep(cfg_path)
        extra = sweep.extra_args
        sys.exit(run_cli_check(
            sweep,
            nband=2 if "lightcurve" in extra["combinations"] else 1,
            lc_len=2 * int(extra.get("max_lightcurve_data_len", 100)),
            sp_len=int(extra.get("max_spectral_data_len", 1000)),
            args=args,
        ))
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    # Multi-host: joins the jax.distributed runtime when launched on a pod
    # (auto-detected) or under MMSN_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID.
    mesh = mesh_from_args(args)

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.cache import load_or_ingest
    from multimodal_supernovae_tpu.data.folds import stratified_kfolds
    from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )
    from multimodal_supernovae_tpu.utils.io import get_valid_dir

    if os.path.isdir(args.config):  # continue an existing sweep
        sweep_dir = args.config
        sweep = load_sweep(os.path.join(sweep_dir, "sweep_config.yaml"))
    else:
        sweep = load_sweep(args.config)
        name = os.path.splitext(os.path.basename(args.config))[0]
        sweep_dir = make_sweep_dir(sweep, args.analysis_path, name)

    extra = sweep.extra_args
    combinations = tuple(extra["combinations"])
    n_classes = int(extra.get("n_classes", 5))

    if args.data_dir and not os.path.isdir(args.data_dir):
        ap.error(f"--data-dir {args.data_dir} does not exist")
    data_dir = args.data_dir or get_valid_dir(
        ["ZTFBTS/", "data/ZTFBTS/", "../data/ZTFBTS/"]
    )
    spectra_dir = args.spectra_dir
    if spectra_dir is None and "spectral" in combinations:
        spectra_dir = get_valid_dir(
            ["ZTFBTS_spectra/", "data/ZTFBTS_spectra/", "../data/ZTFBTS_spectra/"]
        )

    kfolds = extra.get("kfolds")
    ingest_config = dict(
        data_dir=data_dir,
        spectra_dir=spectra_dir,
        combinations=combinations,
        max_data_len_lc=int(extra.get("max_lightcurve_data_len", 100)),
        max_data_len_spec=int(extra.get("max_spectral_data_len", 1000)),
        n_classes=n_classes,
        spectral_rescalefactor=float(extra.get("spectral_rescalefactor", 1e14)),
    )

    def ingest():
        ds, nband, _ = load_ztfbts(kfolds=None, **ingest_config)
        return ds

    dataset, from_cache = load_or_ingest(args.cache_dir, ingest, **ingest_config)
    print(f"dataset: {len(dataset)} samples (cache={'hit' if from_cache else 'miss'})")
    nband = 2 if "lightcurve" in combinations else 1
    folds = stratified_kfolds(dataset.arrays["label"], kfolds) if kfolds else None

    import contextlib

    if args.profile_dir:
        from multimodal_supernovae_tpu.utils.profiling import xprof_trace

        profile_ctx = xprof_trace(args.profile_dir)
    else:
        profile_ctx = contextlib.nullcontext()

    with profile_ctx:
        results = run_sweep(
            sweep, dataset, nband, folds, sweep_dir,
            mesh=mesh,
            use_wandb=args.wandb,
            max_runs=args.max_runs or extra.get("nruns"),
            epochs_override=args.epochs,
            resume=args.resume,
            parallel_folds=args.parallel_folds,
            parallel_members=args.parallel_members,
        )
    for r in results:
        print(
            f"{r['run_dir']}: best {r['best']} epochs={r['epochs_run']} "
            f"wall={r['wall_time_s']:.1f}s"
        )


if __name__ == "__main__":
    main()
