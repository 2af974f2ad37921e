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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="trained run directory (ours or reference)")
    ap.add_argument("--out", required=True,
                    help="artifact path; '<out>.json' gets the manifest")
    ap.add_argument("--batch-size", type=int, default=256,
                    help="the artifact's FIXED batch size (static shapes)")
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

    import jax

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.evaluation.export import (
        batch_to_dict,
        export_encoder,
        load_exported,
        modality_names,
    )
    from multimodal_supernovae_tpu.models.factory import (
        load_model,
        load_run_config,
    )

    run_cfg, extra = load_run_config(args.run_dir)
    combos = tuple(extra.get("combinations", ("lightcurve",)))
    ds = make_synthetic_dataset(
        n=args.batch_size,
        n_max_lc=int(extra.get("max_lightcurve_data_len", 100)),
        nband=int(extra.get("nband", 2)),
        n_max_sp=int(extra.get("max_spectral_data_len", 220)),
        image_size=int(extra.get("image_size", 60)),
        modalities=combos,
    )
    example = ds.to_device().take(np.arange(args.batch_size))
    model, variables, *_ = load_model(args.run_dir, example, which=args.which)

    platforms = (tuple(args.lowering_platforms.split(","))
                 if args.lowering_platforms else None)
    data = export_encoder(model, variables, example, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(data)

    in_spec = {
        k: {"shape": list(np.shape(v)), "dtype": str(np.asarray(v).dtype)}
        for k, v in batch_to_dict(example).items()
    }
    _, exported = load_exported(data)
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
        fn, _ = load_exported(data)
        got = fn(batch_to_dict(example))
        want = model.apply(variables, example, method=model.encode)
        dev = max(float(np.abs(np.asarray(g) - np.asarray(w)).max())
                  for g, w in zip(got, want))
        print(f"check: max |artifact - live| = {dev:.3e}")
        assert dev < 1e-4, "exported artifact deviates from the live model"
        print("CHECK OK")


if __name__ == "__main__":
    main()
