"""MFU scaling probe: the same framework at MXU-healthy encoder widths.

The headline (reference-parity) config runs at ~7.5% MFU — correctly low,
because the reference architecture's head_dim 8/16 uses 8-16 of the MXU's
128 contraction rows and its largest matmuls contract over K=64
(benchmarks/PERF.md §floor). This probe keeps EVERYTHING else identical
(same data shapes, same scanned train step, same flash kernel, same
harness) and widens only the encoders to TPU-healthy dims (head_dim 64,
emb 256/512), to show where the delivered MFU goes when the architecture
stops starving the MXU — i.e. that the ~7.5% is an architecture property,
not a framework property.

Usage: python benchmarks/probe_wide_mfu.py
Writes benchmarks/wide_mfu_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from profile_tpu import time_scan  # noqa: E402  (same harness, same sync)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run only variants whose name contains this "
                         "substring; results MERGE into the existing json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.step import make_epoch_runner
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig
    from multimodal_supernovae_tpu.utils.flops import clip_train_step_flops, mfu

    # (name, lc_emb, lc_heads, sp_emb, sp_heads, use_pallas) — depths stay
    # the reference's (LC 5, SP 13); head_dim = emb/heads. The _dense rows
    # measure the XLA dense-attention path at the same dims: the flash
    # kernel was tuned for the reference's tiny head dims, and at healthy
    # head_dim 64 XLA's own fusion may compete.
    variants = [
        ("ref_emb64_hd8", 64, 8, 32, 2, True),       # maven-lite: hd 8 / 16
        ("wide_emb256_hd64", 256, 4, 256, 4, True),  # hd 64: half MXU rows
        ("wide_emb512_hd64", 512, 8, 512, 8, True),  # hd 64, 4x the FLOPs
        ("wide_emb256_hd64_dense", 256, 4, 256, 4, False),
        ("wide_emb512_hd64_dense", 512, 8, 512, 8, False),
    ]

    if args.only:
        variants = [v for v in variants if args.only in v[0]]

    batch, steps = 256, 64
    ds = make_synthetic_dataset(n=2048, n_max_lc=100, nband=2, n_max_sp=220,
                                seed=0)
    data = ds.to_device()
    rng = np.random.default_rng(0)
    results = {}
    for name, lc_emb, lc_heads, sp_emb, sp_heads, use_pallas in variants:
        seq_lc = {"n_out": 32, "emb": lc_emb, "heads": lc_heads, "depth": 5,
                  "time_norm": 20583.37, "agg": "attn", "dropout": 0.0}
        seq_sp = {"n_out": 32, "emb": sp_emb, "heads": sp_heads, "depth": 13,
                  "time_norm": 17945.14, "agg": "mean", "dropout": 0.0}
        cfg = CLIPConfig.create(
            combinations=("lightcurve", "spectral"), enc_dim=32, nband=2,
            logit_scale_init=19.55, loss="softmax",
            transformer_kwargs=seq_lc, transformer_spectral_kwargs=seq_sp,
            use_pallas=use_pallas, compute_dtype="bfloat16",
        )
        model = CLIPModel(cfg)
        trainer = Trainer(model, task="contrastive",
                          cfg=TrainerConfig(batch_size=batch, lr=5e-4,
                                            noise_level_mag=1.0))
        state = trainer.init_state(data.take(jnp.arange(batch)))
        run_epoch = make_epoch_runner(model, noise_level_img=1.0,
                                      noise_level_mag=1.0, donate=False)
        plan = jnp.asarray(rng.integers(0, len(ds), size=(steps, batch)))
        t0 = time.perf_counter()
        try:
            step_time, last_loss = time_scan(run_epoch, state, data, plan,
                                             jax.random.PRNGKey(0))
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(name, results[name], flush=True)
            continue
        flops = clip_train_step_flops(cfg, batch, t_lc=200, t_sp=220)
        m = mfu(flops, step_time)
        results[name] = {
            "step_ms": round(step_time * 1e3, 2),
            "samples_per_s": round(batch / step_time),
            "model_tflops_per_step": round(flops / 1e12, 3),
            "model_tflops_per_s": m["model_tflops_per_s"],
            "mfu_pct": m["mfu_pct"],
            "compile_s": round(time.perf_counter() - t0, 1),
            "loss": round(last_loss, 4),
            "harness": {"steps_per_scan": steps, "scans": 3,
                        "sync": "value-fetch", "round": "r3s3"},
        }
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "wide_mfu_results.json")
    if args.only and os.path.exists(out):
        # partial rerun: merge into the published record instead of
        # clobbering the variants that were not re-measured
        with open(out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
