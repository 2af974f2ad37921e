#!/usr/bin/env python
"""Maven simulation pretraining: contrastive CLIP on the HDF5 sim corpus.

Rebuild of ``pretraining_clip_wandb.py``: same sweep-YAML CLI, dataset =
the Photometry/Spectroscopy HDF5 (``filename_trainset`` in extra_args, with
``noise``/``dataset_length`` flags), plain random split, contrastive only.

  python scripts/pretrain_sim.py pretrain_config/maven_pretrain_config.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--analysis-path", default="./analysis")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--cache-dir", default="./data_cache")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-runs", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX backend (overrides env/sitecustomize)")
    from multimodal_supernovae_tpu.parallel.distributed import (
        add_mesh_args,
        mesh_from_args,
    )

    add_mesh_args(ap)
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)
    mesh = mesh_from_args(args)

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.cache import load_or_ingest
    from multimodal_supernovae_tpu.data.simulation import ingest_simulation
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
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
    )
    for r in results:
        print(f"{r['run_dir']}: best {r['best']}")


if __name__ == "__main__":
    main()
