#!/usr/bin/env python
"""Measure vmapped parallel training (training/ensemble.py) on the real chip.

The reference trains k-fold members / sweep points sequentially, and its
REAL-DATA recipes run at batch 32 (configs/maven-lite.yaml:51,
maven_finetune.yaml:20) with foldnumber swept 0..4 — small steps that are
latency/overhead-bound on an accelerator, times five. This probe measures
N stacked members of the EXACT headline maven-lite step (bench.build_setup
config, bf16, 64-step scans) at:

  * B=32  (the reference's real-data training batch) — the k-fold target
  * B=256 (the headline bench batch) — compute-bound regime
  * B=256 with XLA dense attention at N=8 — dispatch-policy check (the
    Pallas flash kernel is vmapped over the member axis via its batching
    rule; the member axis batches dense attention toward MXU-friendlier
    shapes, so the default dispatch deserves a re-measure here)

Writes benchmarks/ensemble_results.json. ~12 min on the tunneled v5e
(one remote compile per grid point).

Usage: python benchmarks/probe_ensemble.py [--quick] [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 64
REPEATS = 3


def measure(n_members: int, batch: int, use_pallas, quick: bool) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_setup
    from multimodal_supernovae_tpu.models import CLIPModel
    from multimodal_supernovae_tpu.training.ensemble import (
        make_ensemble_epoch_runner,
        stack_states,
    )
    from multimodal_supernovae_tpu.training.state import TrainState
    from multimodal_supernovae_tpu.data.batching import epoch_indices

    steps = 16 if quick else STEPS
    setup = build_setup(batch=batch, steps_per_scan=steps)
    cfg = dataclasses.replace(setup["cfg"], use_pallas=use_pallas)
    model = CLIPModel(cfg)
    data = setup["data"]
    n_data = int(data.x_lc.shape[0])

    example = data.take(jnp.arange(batch))
    from multimodal_supernovae_tpu.training.optim import build_optimizer

    tx = build_optimizer(lr=5e-4)

    def one_state(seed):
        variables = model.init(jax.random.PRNGKey(seed), example)
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats"),
        )

    states = stack_states([one_state(s) for s in range(n_members)])
    run = make_ensemble_epoch_runner(model, noise_level_mag=1.0)

    plans = []
    for s in range(n_members):
        rng = np.random.default_rng(s)
        p = epoch_indices(n_data, batch, rng=rng, shuffle=True, pad="drop")
        reps = -(-steps // p.shape[0])
        p = np.concatenate([p] * reps, axis=0)[:steps]
        plans.append(p)
    plans = jnp.asarray(np.stack(plans))
    keys = jnp.stack([jax.random.PRNGKey(1000 + s) for s in range(n_members)])

    # warmup/compile (donated input: rebuild states each call via a copy)
    t0 = time.time()
    states2, losses = run(states, data, plans, keys)
    first_losses = np.asarray(jax.device_get(losses))  # sync via value fetch
    compile_s = time.time() - t0
    assert np.isfinite(first_losses).all(), "non-finite ensemble losses"
    if n_members > 1:
        # distinct seeds must yield distinct trajectories
        assert not np.allclose(first_losses[0], first_losses[1]), (
            "member trajectories identical — stacking is broken"
        )

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        states2, losses = run(states2, data, plans, keys)
        float(losses.sum())  # tunnel-safe sync: fetch a value
        times.append(time.time() - t0)
    best = min(times)
    ms_per_step = best / steps * 1e3
    samples_s = n_members * batch * steps / best
    return {
        "n_members": n_members,
        "use_pallas": use_pallas,
        "steps_per_scan": steps,
        "batch": batch,
        "dtype": setup["dtype"],
        "ms_per_step": round(ms_per_step, 3),
        "ensemble_samples_per_s": round(samples_s, 1),
        "compile_s": round(compile_s, 1),
        "repeat_s": [round(t, 4) for t in times],
        "harness": f"{steps}-step scans, min of {REPEATS}, value-fetch sync",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="N=2 only, 16-step scans (smoke/verify)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "ensemble_results.json"))
    args = ap.parse_args()

    from multimodal_supernovae_tpu.utils.platform import select_platform

    select_platform(args.platform)

    results = []
    grid = (
        [(2, 32, None)] if args.quick
        else (
            # the reference's real-data k-fold regime (batch 32, 5 folds)
            [(n, 32, None) for n in (1, 2, 4, 5, 8)]
            # the compute-bound headline batch
            + [(n, 256, None) for n in (1, 2, 4, 8)]
            # dispatch-policy check at the widest member stack
            + [(8, 256, False)]
        )
    )
    for n, b, pallas in grid:
        try:
            r = measure(n, b, pallas, args.quick)
        except Exception as e:  # e.g. dense attention OOMs at N=8 x B=256
            r = {
                "n_members": n, "batch": b, "use_pallas": pallas,
                "error": f"{type(e).__name__}: {str(e)[:400]}",
            }
        results.append(r)
        print(json.dumps(r), flush=True)
        if not args.quick:  # persist incrementally — points take minutes
            with open(args.out, "w") as f:
                json.dump({"results": results, "round": 3}, f, indent=2)
    if not args.quick:
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
