#!/usr/bin/env python
"""Maven simulation pretraining: contrastive CLIP on the HDF5 sim corpus.

Rebuild of ``pretraining_clip_wandb.py``: same sweep-YAML CLI, dataset =
the Photometry/Spectroscopy HDF5 (``filename_trainset`` in extra_args, with
``noise``/``dataset_length`` flags), plain random split, contrastive only.

  python scripts/pretrain_sim.py pretrain_config/maven_pretrain_config.yaml

``--resume`` (with scripts/supervise.py) makes the flagship long job —
~500k samples, pretrain_config/maven_pretrain_config.yaml:53 — preemption
safe. ``--streaming`` trains straight from a sharded on-disk cache
(Trainer.fit_sharded) instead of materialising the corpus in HBM: required
when the HDF5 outgrows device memory, with shard-granular resume.
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
    ap.add_argument("--cache-dir", default="./data_cache")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-runs", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="restore each run's latest checkpoint (ckpt_last, "
                         "or the shard cursor under --streaming) and "
                         "continue; completed runs are skipped")
    ap.add_argument("--streaming", action="store_true",
                    help="train from a sharded on-disk cache via "
                         "Trainer.fit_sharded (>HBM corpora; shard-granular "
                         "resume). The HDF5 is streamed into the cache once")
    ap.add_argument("--rows-per-shard", type=int, default=65536,
                    help="streaming cache shard size (rows)")
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

        sweep = load_sweep(args.config)
        extra = sweep.extra_args
        sys.exit(run_cli_check(
            sweep,
            nband=2,
            lc_len=2 * int(extra.get("max_lightcurve_data_len", 100)),
            sp_len=int(extra.get("max_spectral_data_len", 220)),
            args=args,
        ))
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    mesh = mesh_from_args(args)

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.cache import cache_key, load_or_ingest
    from multimodal_supernovae_tpu.data.simulation import (
        ingest_simulation,
        iter_simulation_chunks,
    )
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
        run_sweep_streaming,
    )
    from multimodal_supernovae_tpu.utils.io import get_valid_dir

    sweep = load_sweep(args.config)
    extra = sweep.extra_args
    name = os.path.splitext(os.path.basename(args.config))[0]
    sweep_dir = make_sweep_dir(sweep, args.analysis_path, name)

    data_dir = args.data_dir or get_valid_dir(
        ["data/sim_data/", "sim_data/", "../data/sim_data/"]
    )
    hdf5_path = os.path.join(
        data_dir, extra.get("filename_trainset", "ZTF_Pretrain_5Class.hdf5")
    )
    ingest_config = dict(
        hdf5_path=hdf5_path,
        bands=("r", "g"),  # pretraining_clip_wandb.py:61-74 uses both bands
        n_max_obs=int(extra.get("max_lightcurve_data_len", 100)),
        n_max_obs_spec=int(extra.get("max_spectral_data_len", 220)),
        combinations=tuple(extra["combinations"]),
        noise=bool(extra.get("noise", True)),
        dataset_length=extra.get("dataset_length"),
    )

    if args.streaming:
        from multimodal_supernovae_tpu.data.streaming import (
            MANIFEST,
            ShardedDataset,
            ValHoldout,
            load_val_split,
            save_val_split,
            write_sharded_cache,
        )

        val_fraction = float(extra.get("val_fraction", 0.2))
        key = cache_key(
            kind="sim-stream", rows_per_shard=args.rows_per_shard,
            val_fraction=val_fraction, **ingest_config,
        )
        stream_dir = os.path.join(args.cache_dir, f"stream-{key}")
        if os.path.exists(os.path.join(stream_dir, MANIFEST)):
            sds = ShardedDataset(stream_dir)
            val_ds = load_val_split(stream_dir)
            print(f"sharded cache hit: {len(sds)} train rows in "
                  f"{sds.n_shards} shards + {len(val_ds)} val rows")
        else:
            holdout = ValHoldout(val_fraction, seed=0)
            sds = write_sharded_cache(
                stream_dir,
                holdout.wrap(iter_simulation_chunks(**ingest_config)),
                args.rows_per_shard,
            )
            val_ds = holdout.dataset()
            save_val_split(stream_dir, val_ds)
            print(f"sharded cache written: {len(sds)} train rows in "
                  f"{sds.n_shards} shards + {len(val_ds)} val rows")
        results = run_sweep_streaming(
            sweep, sds, val_ds, nband=2, sweep_dir=sweep_dir,
            use_wandb=args.wandb,
            max_runs=args.max_runs or extra.get("nruns"),
            epochs_override=args.epochs,
            mesh=mesh,
            resume=args.resume,
        )
        for r in results:
            print(f"{r['run_dir']}: best {r['best']}")
        return

    dataset, from_cache = load_or_ingest(
        args.cache_dir, lambda: ingest_simulation(**ingest_config), **ingest_config
    )
    print(f"sim dataset: {len(dataset)} samples (cache={'hit' if from_cache else 'miss'})")

    results = run_sweep(
        sweep, dataset, nband=2, folds=None, sweep_dir=sweep_dir,
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
