#!/usr/bin/env python
"""Masked light-curve pretraining (MAE-style).

The trainer the reference's README references as ``retraining_wandb.py`` but
does not ship (SURVEY.md §2.3): trains ``MaskedLightCurveEncoder`` on the
legacy simulation corpus (TransientTable HDF5) or real ZTF BTS light curves,
with the StepLR schedule the reference's lr_scheduler_kwargs configure
(src/models_pretraining.py:167-189).

  python scripts/pretrain_masked.py configs/config_grid.yaml --source sim
"""

from __future__ import annotations

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--source", choices=["sim", "real"], default="sim")
    ap.add_argument("--analysis-path", default="./analysis")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--cache-dir", default="./data_cache")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-runs", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="restore each run's ckpt_last and continue; "
                         "completed runs (summary.json present) are skipped")
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
            masked_model_builder,
        )
        from multimodal_supernovae_tpu.training.preflight import run_cli_check

        sweep = load_sweep(args.config)
        extra = sweep.extra_args
        sys.exit(run_cli_check(
            sweep,
            nband=2,
            lc_len=2 * int(extra.get("max_lightcurve_data_len", 100)),
            sp_len=int(extra.get("max_spectral_data_len", 220)),
            args=args,
            model_builder=masked_model_builder(extra),
            combinations=("lightcurve",),  # the masked trainer is LC-only
        ))
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    mesh = mesh_from_args(args)

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.cache import load_or_ingest
    from multimodal_supernovae_tpu.models.factory import masked_model_builder
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )
    from multimodal_supernovae_tpu.utils.io import get_valid_dir

    sweep = load_sweep(args.config)
    extra = sweep.extra_args
    name = os.path.splitext(os.path.basename(args.config))[0] + "-masked"
    sweep_dir = make_sweep_dir(sweep, args.analysis_path, name)

    if args.source == "sim":
        from multimodal_supernovae_tpu.data.simulation import (
            ingest_simulation_lightcurves,
        )

        data_dir = args.data_dir or get_valid_dir(["data/sim_data/", "sim_data/"])
        hdf5_path = os.path.join(
            data_dir, extra.get("filename_trainset", "ZTF_Pretrain_5Class.hdf5")
        )
        ingest_config = dict(
            hdf5_path=hdf5_path,
            bands=("r", "g"),
            n_max_obs=int(extra.get("max_lightcurve_data_len", 100)),
            dataset_length=extra.get("dataset_length"),
        )
        dataset, _ = load_or_ingest(
            args.cache_dir,
            lambda: ingest_simulation_lightcurves(**ingest_config),
            kind="simlc",
            **ingest_config,
        )
    else:
        from multimodal_supernovae_tpu.data.ztfbts import load_ztfbts

        data_dir = args.data_dir or get_valid_dir(["ZTFBTS/", "data/ZTFBTS/"])
        ingest_config = dict(
            data_dir=data_dir,
            combinations=("lightcurve",),
            max_data_len_lc=int(extra.get("max_lightcurve_data_len", 100)),
        )
        dataset, _ = load_or_ingest(
            args.cache_dir,
            lambda: load_ztfbts(kfolds=None, **ingest_config)[0],
            kind="ztfbts-lc",
            **ingest_config,
        )

    results = run_sweep(
        sweep, dataset, nband=2, folds=None, sweep_dir=sweep_dir,
        model_builder=masked_model_builder(extra),
        use_wandb=args.wandb,
        max_runs=args.max_runs or extra.get("nruns"),
        epochs_override=args.epochs,
        mesh=mesh,
        resume=args.resume,
    )
    for r in results:
        print(f"{r['run_dir']}: best {r['best']}")


if __name__ == "__main__":
    main()
