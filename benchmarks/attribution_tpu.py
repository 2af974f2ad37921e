"""Train-step cost attribution: ablate one component at a time to see where
the 24 ms (B=256, flash) goes. All variants flash-attention, bimodal CLIP.

Usage: python benchmarks/attribution_tpu.py
Writes benchmarks/attribution_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

LC = {"n_out": 32, "emb": 64, "heads": 8, "depth": 5,
      "time_norm": 20583.37, "agg": "attn", "dropout": 0.0}
SP = {"n_out": 32, "emb": 32, "heads": 2, "depth": 13,
      "time_norm": 17945.14, "agg": "mean", "dropout": 0.0}


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_supernovae_tpu.data.batching import epoch_indices
    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.step import make_epoch_runner
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    ds = make_synthetic_dataset(n=2048, n_max_lc=100, nband=2, n_max_sp=220, seed=0)
    data = ds.to_device()
    # 64 steps/scan: the 16-step harness carried ~1.8 ms/step of tunnel RTT
    # (r2 lesson); every entry is stamped with its harness.
    batch, steps = 256, 64
    rng = np.random.default_rng(0)
    plan = jnp.asarray(
        epoch_indices(len(ds), batch, rng=rng, shuffle=True, pad="drop")[:steps]
    )

    def variant(lc=None, sp=None, noise=1.0, heads_lc=None):
        lc_kw = dict(LC, **(lc or {}))
        sp_kw = dict(SP, **(sp or {}))
        if heads_lc:
            lc_kw["heads"] = heads_lc
        return lc_kw, sp_kw, noise

    variants = {
        "baseline": variant(),
        "spectral_depth1": variant(sp={"depth": 1}),
        "lc_depth1": variant(lc={"depth": 1}),
        "no_augment": variant(noise=0.0),
        "lc_agg_mean": variant(lc={"agg": "mean"}),
        "lc_heads2": variant(heads_lc=2),
    }

    results = {}
    for name, (lc_kw, sp_kw, noise) in variants.items():
        cfg = CLIPConfig.create(
            combinations=("lightcurve", "spectral"), enc_dim=32, nband=2,
            logit_scale_init=19.55, loss="softmax",
            transformer_kwargs=lc_kw, transformer_spectral_kwargs=sp_kw,
            use_pallas=True,
        )
        model = CLIPModel(cfg)
        trainer = Trainer(model, task="contrastive",
                          cfg=TrainerConfig(batch_size=batch, lr=5e-4))
        state = trainer.init_state(data.take(jnp.arange(batch)))
        run_epoch = make_epoch_runner(model, noise_level_mag=noise, donate=False)
        try:
            state2, losses = run_epoch(state, data, plan, jax.random.PRNGKey(0))
            float(losses.sum())
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                state2, losses = run_epoch(state2, data, plan, jax.random.PRNGKey(0))
                float(losses.sum())
                times.append(time.perf_counter() - t0)
            results[name] = {
                "step_ms": round(min(times) / steps * 1e3, 2),
                "harness": {"steps_per_scan": steps, "scans": 3,
                            "sync": "value-fetch", "round": "r3"},
            }
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "attribution_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
