#!/usr/bin/env python
"""Export a trained run to a self-contained AOT serving artifact.

Serializes the frozen encoder (params baked in) to StableHLO bytes via
``jax.export`` (evaluation/export.py) plus a JSON manifest of the input
contract — a serving host reloads both WITHOUT this package's model code
or checkpoint files. No dataset is needed: the example batch is
synthesized at the run config's shapes.

No reference counterpart (it re-builds the torch model from source +
checkpoint for every use, evaluate_models.py:269-303); this is the
deployment complement of scripts/infer.py (which serves live from a
checkpoint).

  python scripts/export_model.py analysis/maven-lite/run-0 \
      --out model.stablehlo --batch-size 256 --check
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="trained run directory (ours or reference)")
    ap.add_argument("--out", required=True,
                    help="artifact path; '<out>.json' gets the manifest")
    ap.add_argument("--batch-size", type=int, default=256,
                    help="the artifact's FIXED batch size (static shapes)")
    ap.add_argument("--lc-len", type=int, default=None,
                    help="PER-BAND light-curve length (the reference's "
                         "max_lightcurve_data_len; total baked band-blocked "
                         "length = lc-len x nband) (default: run config, "
                         "else 100); must match the serving data — --check "
                         "is shape-self-consistent and cannot catch a "
                         "mismatch")
    ap.add_argument("--sp-len", type=int, default=None,
                    help="spectrum length baked into the artifact (default: "
                         "run config, else 1000 — the real-data default of "
                         "scripts/train.py; sim-pretrain runs use 220)")
    ap.add_argument("--image-size", type=int, default=None,
                    help="host-galaxy cutout size (default: run config, "
                         "else 60 — the ZTFBTS host PNG size)")
    ap.add_argument("--which", choices=["best", "last"], default="best")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--lowering-platforms", default=None,
                    help="comma list for jax.export (e.g. 'tpu' or "
                         "'cpu,tpu'); default: the current backend")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and compare against the live "
                         "model on the example batch")
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.evaluation.export import (
        batch_to_dict,
        export_encoder,
        load_exported,
        modality_names,
    )
    from multimodal_supernovae_tpu.models.factory import (
        initialize_from_run_dir,
        load_model,
    )

    # Fail fast on families without an embedding surface (finetune heads,
    # masked pretrainers) before paying the checkpoint restore.
    probe_model, run_cfg, extra = initialize_from_run_dir(args.run_dir)
    if not hasattr(probe_model, "encode"):
        sys.exit(
            f"error: {args.run_dir} rebuilds as "
            f"{type(probe_model).__name__}, which has no embedding encoder "
            "to export. Export the pretrained CLIP backbone run directory "
            "instead (the run's extra_args 'pretrain_path')."
        )

    combos = tuple(extra.get("combinations", ("lightcurve",)))
    # Baked input shapes: flag > run config > the real-data serving defaults
    # (scripts/train.py / scripts/infer.py real-ZTFBTS branch).
    lc_len = args.lc_len or int(extra.get("max_lightcurve_data_len", 100))
    sp_len = args.sp_len or int(extra.get("max_spectral_data_len", 1000))
    image_size = args.image_size or int(extra.get("image_size", 60))
    ds = make_synthetic_dataset(
        n=args.batch_size,
        n_max_lc=lc_len,
        nband=int(extra.get("nband", 2)),
        n_max_sp=sp_len,
        image_size=image_size,
        modalities=combos,
    )
    example = ds.to_device().take(np.arange(args.batch_size))
    model, variables, *_ = load_model(args.run_dir, example, which=args.which)

    platforms = (tuple(p.strip() for p in args.lowering_platforms.split(",")
                       if p.strip())
                 if args.lowering_platforms else None)
    data = export_encoder(model, variables, example, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(data)

    in_spec = {
        k: {"shape": list(np.shape(v)), "dtype": str(np.asarray(v).dtype)}
        for k, v in batch_to_dict(example, model.cfg.combinations).items()
    }
    fn, exported = load_exported(data)
    manifest = {
        "artifact": os.path.basename(args.out),
        "bytes": len(data),
        "platforms": list(exported.platforms),
        "batch_size": args.batch_size,
        "input": in_spec,
        "output_modalities": modality_names(model),
        "run_dir": os.path.abspath(args.run_dir),
        "which": args.which,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps({k: manifest[k] for k in
                      ("bytes", "platforms", "batch_size",
                       "output_modalities")}))

    if args.check:
        from multimodal_supernovae_tpu.data.batching import Batch

        d = batch_to_dict(example, model.cfg.combinations)
        got = fn(d)
        # jit the live side: the artifact IS the compiled jit(encode), so
        # the comparison is same-program; an unjitted (op-by-op) reference
        # legitimately deviates by bf16-matmul fusion differences on TPU.
        want = jax.jit(
            lambda d: model.apply(variables, Batch(**d), method=model.encode)
        )(d)
        dev = max(float(np.abs(np.asarray(g) - np.asarray(w)).max())
                  for g, w in zip(got, want))
        print(f"check: max |artifact - live| = {dev:.3e}")
        assert dev < 1e-4, "exported artifact deviates from the live model"
        print("CHECK OK")


if __name__ == "__main__":
    main()
