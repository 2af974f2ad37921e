"""Train-step time attribution by ablation (the tunnel has no xprof view,
so we subtract jitted variants instead). All variants share one process to
amortise remote compiles.

Usage: python benchmarks/ablate_tpu.py
Writes benchmarks/ablate_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

BATCH = 256
STEPS = 16
SCANS = 3


def timed_scan(fn, init, xs, steps=None):
    """fn: (carry, x) -> (carry, out_scalarish). Returns per-step seconds."""
    import jax

    steps = steps or STEPS

    @jax.jit
    def run(init, xs):
        return jax.lax.scan(fn, init, xs)

    carry, out = run(init, xs)
    _sync(out)
    times = []
    for _ in range(SCANS):
        t0 = time.perf_counter()
        carry, out = run(init, xs)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return min(times) / steps


def _sync(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    float(np.asarray(leaves[0]).ravel()[0].sum())


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_supernovae_tpu.data.augment import augment_batch
    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.step import (
        make_loss_computer,
        make_train_step,
    )
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    seq_lc = {"n_out": 32, "emb": 64, "heads": 8, "depth": 5,
              "time_norm": 20583.37, "agg": "attn", "dropout": 0.0}
    seq_sp = {"n_out": 32, "emb": 32, "heads": 2, "depth": 13,
              "time_norm": 17945.14, "agg": "mean", "dropout": 0.0}

    results = {}
    ds = make_synthetic_dataset(n=2048, n_max_lc=100, nband=2, n_max_sp=220, seed=0)
    data = ds.to_device()
    rng = np.random.default_rng(0)
    plan = jnp.asarray(rng.integers(0, len(ds), size=(STEPS, BATCH)))
    key = jax.random.PRNGKey(0)

    def build(combos=("lightcurve", "spectral"), use_pallas=True,
              dtype="bfloat16"):
        cfg = CLIPConfig.create(
            combinations=combos, enc_dim=32, nband=2, logit_scale_init=19.55,
            loss="softmax", transformer_kwargs=seq_lc,
            transformer_spectral_kwargs=seq_sp, use_pallas=use_pallas,
            compute_dtype=None if dtype == "float32" else dtype,
        )
        model = CLIPModel(cfg)
        trainer = Trainer(model, task="contrastive",
                          cfg=TrainerConfig(batch_size=BATCH, lr=5e-4,
                                            noise_level_mag=1.0))
        state = trainer.init_state(data.take(jnp.arange(BATCH)))
        return model, state

    # --- raw matmul calibration: what the chip actually delivers ---------
    for name, (m, k, n) in {
        "matmul_51200x64x64": (51200, 64, 64),      # LC qkv-ish
        "matmul_51200x64x256": (51200, 64, 256),    # LC ff-ish
        "matmul_4096x1024x1024": (4096, 1024, 1024),  # healthy reference point
    }.items():
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)

        # Two traps fixed the hard way: (1) affine carry-dependence gets
        # factored out of the (linear) matmul and the dot hoisted as
        # loop-invariant, so the carry threads through a nonlinearity;
        # (2) a 16-step scan's ~28 ms tunnel RTT floor swamps a ~50 us
        # matmul, so the calibration scans 512 steps.
        def mm(carry, _, a=a, b=b):
            out = jnp.maximum(a, carry) @ b
            return out[0, 0].astype(jnp.float32) * 1e-9, out.sum()

        sec = timed_scan(mm, jnp.float32(0.0), jnp.arange(512), steps=512)
        results[name] = {"us": round(sec * 1e6, 1),
                         "tflops": round(2 * m * k * n / sec / 1e12, 2)}
        print(name, results[name], flush=True)

    # --- full step and ablations -----------------------------------------
    model, state = build()
    step = make_train_step(model, noise_level_mag=1.0)

    def full(carry, idx):
        st, k = carry
        k, sub = jax.random.split(k)
        st, loss = step(st, data.take(idx), sub)
        return (st, k), loss

    results["full_train_step"] = {
        "ms": round(timed_scan(full, (state, key), plan) * 1e3, 2)}
    print("full_train_step", results["full_train_step"], flush=True)

    # no optimizer: loss+grad only
    compute = make_loss_computer(model)

    def gradonly(carry, idx):
        st, k = carry
        k, ak, dk, lk = jax.random.split(k, 4)
        batch = augment_batch(data.take(idx), ak, 0.0, 1.0)

        def loss_of(p):
            loss, aux, _ = compute(p, st.batch_stats, batch, dk, lk, True)
            return loss

        g = jax.grad(loss_of)(st.params)
        # consume EVERY grad leaf or XLA dead-code-eliminates most of the
        # backward (v1 of this script summed one leaf and measured fwd-only)
        total = sum(x.sum().astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(g))
        return (st, k), total

    results["grad_no_update"] = {
        "ms": round(timed_scan(gradonly, (state, key), plan) * 1e3, 2)}
    print("grad_no_update", results["grad_no_update"], flush=True)

    # fwd only (loss, no grad)
    def fwdonly(carry, idx):
        st, k = carry
        k, ak, lk = jax.random.split(k, 3)
        batch = augment_batch(data.take(idx), ak, 0.0, 1.0)
        loss, aux, _ = compute(st.params, st.batch_stats, batch, None, lk, False)
        return (st, k), loss

    results["fwd_only"] = {
        "ms": round(timed_scan(fwdonly, (state, key), plan) * 1e3, 2)}
    print("fwd_only", results["fwd_only"], flush=True)

    # fwd, no augmentation (isolates augment cost)
    def fwd_noaug(carry, idx):
        st, k = carry
        k, lk = jax.random.split(k)
        loss, aux, _ = compute(st.params, st.batch_stats, data.take(idx),
                               None, lk, False)
        return (st, k), loss

    results["fwd_no_aug"] = {
        "ms": round(timed_scan(fwd_noaug, (state, key), plan) * 1e3, 2)}
    print("fwd_no_aug", results["fwd_no_aug"], flush=True)

    # single encoders, fwd (same trained-shape params as the full model)
    for nm in ("lc", "sp"):
        if nm == "lc":
            def enc(p, batch, model1=model):
                return model1.apply({"params": p}, batch.x_lc, batch.t_lc,
                                    batch.mask_lc, train=False,
                                    method=model1.embed_lightcurve)
        else:
            def enc(p, batch, model1=model):
                return model1.apply({"params": p}, batch.x_sp, batch.t_sp,
                                    batch.mask_sp, train=False,
                                    method=model1.embed_spectral)

        def encstep(carry, idx, enc=enc):
            st, k = carry
            e = enc(st.params, data.take(idx))
            return (st, k), e.sum()

        try:
            results[f"fwd_{nm}_encoder"] = {
                "ms": round(timed_scan(encstep, (state, key), plan) * 1e3, 2)}
        except Exception as e:
            results[f"fwd_{nm}_encoder"] = {"error": str(e)[:160]}
        print(f"fwd_{nm}_encoder", results[f"fwd_{nm}_encoder"], flush=True)

    # attention op in isolation at the LC encoder's shapes (B=256, H=8,
    # T=200, S=8): fwd and fwd+bwd, flash vs dense
    from multimodal_supernovae_tpu.ops.attention import attention

    kq = jax.random.PRNGKey(1)
    qa = jax.random.normal(kq, (BATCH, 8, 200, 8), jnp.bfloat16)
    ka = jax.random.normal(kq, (BATCH, 8, 200, 8), jnp.bfloat16)
    va = jax.random.normal(kq, (BATCH, 8, 200, 8), jnp.bfloat16)
    am = jnp.ones((BATCH, 200), bool)

    for pname, pall in (("flash", True), ("dense", False)):
        def att_fwd(carry, _, pall=pall):
            out = attention(qa + carry, ka, va, am, 64, use_pallas=pall)
            return out[0, 0, 0, 0].astype(jnp.float32), out.sum()

        def att_fb(carry, _, pall=pall):
            def f(q, k, v):
                return attention(q, k, v, am, 64, use_pallas=pall).sum()

            g = jax.grad(f, argnums=(0, 1, 2))(qa + carry, ka, va)
            s = sum(x.sum().astype(jnp.float32) for x in g)
            return s * 0.0, s

        results[f"attn_{pname}_fwd"] = {
            "ms": round(timed_scan(att_fwd, jnp.float32(0.0),
                                   jnp.arange(STEPS)) * 1e3, 3)}
        print(f"attn_{pname}_fwd", results[f"attn_{pname}_fwd"], flush=True)
        results[f"attn_{pname}_fwdbwd"] = {
            "ms": round(timed_scan(att_fb, jnp.float32(0.0),
                                   jnp.arange(STEPS)) * 1e3, 3)}
        print(f"attn_{pname}_fwdbwd", results[f"attn_{pname}_fwdbwd"], flush=True)

    # dense attention full step (flash off)
    model_d, state_d = build(use_pallas=False)
    step_d = make_train_step(model_d, noise_level_mag=1.0)

    def full_d(carry, idx):
        st, k = carry
        k, sub = jax.random.split(k)
        st, loss = step_d(st, data.take(idx), sub)
        return (st, k), loss

    results["full_train_step_dense"] = {
        "ms": round(timed_scan(full_d, (state_d, key), plan) * 1e3, 2)}
    print("full_train_step_dense", results["full_train_step_dense"], flush=True)

    out = os.path.join(os.path.dirname(__file__), "ablate_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
