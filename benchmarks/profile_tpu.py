"""TPU performance sweep: where does the train-step time go, and what do
bf16 / batch size / modality ablations buy? One process, several jitted
variants (amortises the tunnel's slow remote compiles).

Usage: python benchmarks/profile_tpu.py [--quick]
Writes benchmarks/profile_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def time_scan(run_epoch, state, data, plan, key, scans=3):
    import jax.numpy as jnp

    state2, losses = run_epoch(state, data, plan, key)  # compile
    float(losses.sum())  # true barrier (block_until_ready is broken here)
    times = []
    for _ in range(scans):
        t0 = time.perf_counter()
        state2, losses = run_epoch(state2, data, plan, key)
        float(losses.sum())
        times.append(time.perf_counter() - t0)
    return min(times) / plan.shape[0], float(losses[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run only variants whose name contains this "
                         "substring; results MERGE into the existing json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_supernovae_tpu.data.batching import epoch_indices
    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.step import make_epoch_runner
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    seq_lc = {"n_out": 32, "emb": 64, "heads": 8, "depth": 5,
              "time_norm": 20583.37, "agg": "attn", "dropout": 0.0}
    seq_sp = {"n_out": 32, "emb": 32, "heads": 2, "depth": 13,
              "time_norm": 17945.14, "agg": "mean", "dropout": 0.0}

    ds = make_synthetic_dataset(n=2048, n_max_lc=100, nband=2, n_max_sp=220, seed=0)
    ds_tri = make_synthetic_dataset(
        n=512, n_max_lc=100, nband=2, n_max_sp=220, image_size=60, seed=0,
        modalities=("host_galaxy", "lightcurve", "spectral"),
    )
    data = ds.to_device()
    data_tri = ds_tri.to_device()
    results = {}

    bi = ("lightcurve", "spectral")
    tri = ("host_galaxy", "lightcurve", "spectral")
    quad = ("host_galaxy", "lightcurve", "spectral", "meta")
    bf16 = dict(use_pallas=True, compute_dtype="bfloat16")
    variants = [
        ("flash_b256_bf16", bf16, 256, bi),
        ("flash_b256_bf16_fwdonly", bf16, 256, bi),
        # serving/inference path (embedding export, scripts/infer.py):
        # forward-only at the large-batch regime
        ("flash_b1024_bf16_fwdonly", bf16, 1024, bi),
        ("flash_b512_bf16", bf16, 512, bi),
        ("flash_b1024_bf16", bf16, 1024, bi),
        ("flash_b256_f32", dict(use_pallas=True), 256, bi),
        ("flash_trimodal_b256_bf16", bf16, 256, tri),
        # the reference's full 4-modality path (AUC_val{1..6},
        # models_multimodal.py:527-556) exercised on the real chip
        ("flash_quadrimodal_b256_bf16", bf16, 256, quad),
        # ours: the TPU-first ViT image tower (models/vit.py) vs the
        # reference-parity ConvMixer at the same trimodal recipe
        ("flash_trimodal_vit_b256_bf16",
         dict(image_encoder="vit", **bf16), 256, tri),
        # compute-matched small ViT (emb 64 / depth 4 ~ the ConvMixer's
        # image-tower cost) — is the option free at equal capacity?
        ("flash_trimodal_vit_small_b256_bf16",
         dict(image_encoder="vit",
              vit_kwargs={"emb": 64, "depth": 4, "heads": 2,
                          "patch_size": 10, "n_out": 32,
                          "dropout_prob": 0.0},
              **bf16), 256, tri),
    ]
    if args.quick:
        variants = variants[:2]
    if args.only:
        variants = [v for v in variants if args.only in v[0]]

    rng = np.random.default_rng(0)
    for name, extra_cfg, batch, combos in variants:
        if "budget12M" in name:
            os.environ["MMSN_FLASH_VMEM_BUDGET"] = str(12 * 1024 * 1024)
        elif "budget8M" in name:
            os.environ["MMSN_FLASH_VMEM_BUDGET"] = str(8 * 1024 * 1024)
        elif "budget1M" in name:
            os.environ["MMSN_FLASH_VMEM_BUDGET"] = str(1 * 1024 * 1024)
        else:
            os.environ.pop("MMSN_FLASH_VMEM_BUDGET", None)
        conv = {"dim": 32, "depth": 8, "kernel_size": 5, "patch_size": 10,
                "n_out": 32, "dropout_prob": 0.0}
        meta = {"input_dim": 128, "hidden_dim": 128, "num_layers": 2,
                "dropout_prob": 0.0}  # the reference's meta-encoder defaults
        vit = {"emb": 128, "depth": 6, "heads": 4, "patch_size": 10,
               "n_out": 32, "dropout_prob": 0.0}
        extra_cfg = dict(extra_cfg)
        vit = extra_cfg.pop("vit_kwargs", vit)
        cfg = CLIPConfig.create(
            combinations=combos, enc_dim=32, nband=2, logit_scale_init=19.55,
            loss="softmax",
            transformer_kwargs=seq_lc, transformer_spectral_kwargs=seq_sp,
            conv_kwargs=conv, meta_kwargs=meta, vit_kwargs=vit,
            **extra_cfg,
        )
        model = CLIPModel(cfg)
        d = data_tri if "host_galaxy" in combos else data
        n_rows = len(ds_tri) if "host_galaxy" in combos else len(ds)
        trainer = Trainer(model, task="contrastive",
                          cfg=TrainerConfig(batch_size=batch, lr=5e-4,
                                            noise_level_mag=1.0))
        state = trainer.init_state(d.take(jnp.arange(batch)))
        if "fwdonly" in name:
            from multimodal_supernovae_tpu.training.step import make_eval_runner

            eval_run = make_eval_runner(model)

            def run_epoch(state, data, plan, key, _er=eval_run, _st=state):
                losses, _ = _er(_st, data, plan, key)
                return _st, losses
        else:
            run_epoch = make_epoch_runner(model, noise_level_img=1.0,
                                          noise_level_mag=1.0, donate=False)
        # Fixed 64-step plan regardless of batch/dataset size: random row
        # gathers are perf-equivalent to a shuffled epoch, and 64 steps per
        # scan amortise the tunnel's ~30 ms readback RTT to <0.5 ms/step
        # (the r1/r2 16-step harness carried ~1.8 ms/step of phantom
        # overhead — every entry is stamped with its harness).
        steps = 64
        plan = jnp.asarray(rng.integers(0, n_rows, size=(steps, batch)))
        t0 = time.perf_counter()
        try:
            step_time, last_loss = time_scan(run_epoch, state, d, plan,
                                             jax.random.PRNGKey(0))
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(name, results[name], flush=True)
            continue
        results[name] = {
            "step_ms": round(step_time * 1e3, 2),
            "samples_per_s": round(batch / step_time),
            "compile_s": round(time.perf_counter() - t0, 1),
            "loss": round(last_loss, 4),
            "harness": {"steps_per_scan": steps, "scans": 3,
                        "sync": "value-fetch", "round": "r3"},
        }
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "profile_results.json")
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
