#!/usr/bin/env python
"""Export a trained run back to the reference's torch format.

The reverse of the importer (models/factory.py): the run's weights become a
``.ckpt`` whose state_dict strict-loads into the reference's own torch
modules (src/models_multimodal.py, src/models_pretraining.py), and the run
dir becomes a reference-style tree (config.yaml + split manifests +
``../sweep_config.yaml``) its ``initialize_model``/``load_model``
(models_multimodal.py:559-758) consume directly. Closing the migration
loop: train here on TPU, evaluate/fine-tune there — or anywhere torch runs.

  python scripts/export_torch.py analysis/maven-lite/run-0 \
      --out exported_sweep/run-0

Caveat: the reference's initialize_model hardcodes enc_dim=128; runs with a
different shared-space width export fine but need a hand-constructed
LightCurveImageCLIP(enc_dim=...) on the torch side (a warning says so).
"""

from __future__ import annotations

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="trained run directory")
    ap.add_argument("--out", required=True,
                    help="output run directory (created; the sweep sidecar "
                         "lands one level above it)")
    ap.add_argument("--which", choices=["best", "last"], default="best")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="JAX backend for the restore (default: cpu — no "
                         "TPU claim needed to convert weights)")
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform or "cpu")
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodal_supernovae_tpu.models.torch_export import (
        export_run_dir_to_reference,
    )

    ckpt = export_run_dir_to_reference(args.run_dir, args.out,
                                       which=args.which)
    print(f"wrote {ckpt}")
    print(f"reference usage: src.models_multimodal.load_model({ckpt!r})")


if __name__ == "__main__":
    main()
