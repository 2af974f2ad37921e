#!/usr/bin/env python
"""Embedding server: dynamic-batching HTTP daemon on one TPU chip.

Serves L2-normalized per-modality embeddings over HTTP from either an AOT
artifact (scripts/export_model.py — no checkpoint restore, compile-once)
or live from any run directory this framework can restore (ours or the
reference's torch run dirs). Clients POST 1..n samples; the daemon
coalesces concurrent requests onto the artifact's fixed device batch
(multimodal_supernovae_tpu/serving/). No reference counterpart — the
reference re-builds its model per use (evaluate_models.py:269-303) and has
no serving entry point.

  python scripts/serve.py --artifact model.stablehlo --port 8000
  python scripts/serve.py --run-dir analysis/maven-lite/run-0 \
      --batch-size 256 --max-wait-ms 5

Client (numpy only):

  import io, urllib.request, numpy as np
  buf = io.BytesIO(); np.savez(buf, x_lc=..., t_lc=..., mask_lc=..., ...)
  req = urllib.request.Request("http://host:8000/embed", buf.getvalue(),
                               {"Content-Type": "application/x-npz"})
  with np.load(io.BytesIO(urllib.request.urlopen(req).read())) as z:
      emb = z["emb_lightcurve"]
"""

from __future__ import annotations

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact",
                     help="StableHLO artifact from scripts/export_model.py "
                          "(expects '<artifact>.json' manifest next to it)")
    src.add_argument("--run-dir",
                     help="serve live from a trained run directory")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000,
                    help="0 binds an ephemeral port (printed at startup)")
    ap.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="batching window after the first queued request")
    ap.add_argument("--batch-size", type=int, default=256,
                    help="device batch for --run-dir (the --artifact batch "
                         "is baked into the artifact)")
    ap.add_argument("--which", choices=["best", "last"], default="best")
    ap.add_argument("--lc-len", type=int, default=None,
                    help="--run-dir only: per-band light-curve length "
                         "(default: run config, else 100)")
    ap.add_argument("--sp-len", type=int, default=None)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--quiet", action="store_true",
                    help="suppress per-request access logs")
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)
    from multimodal_supernovae_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from multimodal_supernovae_tpu.serving import load_artifact, load_live, serve

    if args.artifact:
        model = load_artifact(args.artifact)
    else:
        model = load_live(args.run_dir, args.batch_size, which=args.which,
                          lc_len=args.lc_len, sp_len=args.sp_len,
                          image_size=args.image_size)
    serve(model, host=args.host, port=args.port,
          max_wait_ms=args.max_wait_ms, quiet=args.quiet)


if __name__ == "__main__":
    main()
