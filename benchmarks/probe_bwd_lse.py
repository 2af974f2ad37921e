"""Isolated probe: backward flash kernel, recompute-softmax vs lse-residual.

Hypothesis (r3 follow-up): the backward recomputes the full softmax
(max + exp + sum reductions over the (NB, TQ, T) score tile) per call, but
the forward already owns the row max m and denominator s. Passing those two
(BH, T) f32 tensors into the backward lets it skip both big VPU reductions:
probs = exp(scores - m) * (1/s). The earlier rejected rewrite (PERF.md r3)
folded 1/s into the dot OPERANDS and never materialised probs; this variant
keeps the exact current dataflow and only removes the two reductions.

Measures per-call time of both kernels at the LC and SP headline shapes via
a scanned loop (carry passed through jnp.maximum into q so XLA cannot hoist
the pallas_call — see memory: tpu-tunnel-measurement).

Usage: python benchmarks/probe_bwd_lse.py [calls]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from multimodal_supernovae_tpu.ops import pallas_attention as pa


def _bwd_kernel_lse(q_ref, k_ref, v_ref, mask_ref, m_ref, s_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, scale: float):
    qi = pl.program_id(1)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    c2 = scale * scale

    scores = pa._batched_dot(q * scale, k * scale, 1, 1)  # (NB, TQ, T) f32
    scores = pa._apply_mask(scores, mask_ref)
    # lse residuals: skip the max and sum reductions entirely
    e = jnp.exp(scores - m_ref[...][:, :, None])
    probs = e * (1.0 / s_ref[...])[:, :, None]

    dprobs = pa._batched_dot(g, v, 1, 1)
    dscores = probs * (dprobs - jnp.sum(probs * dprobs, axis=-1,
                                        keepdims=True))
    dscores = jnp.where(mask_ref[...][:, None, :], dscores, 0.0).astype(q.dtype)
    probs = probs.astype(v.dtype)

    dq_ref[...] = (pa._batched_dot(k, dscores, 2, 2) * c2).astype(dq_ref.dtype)
    dk_tile = pa._batched_dot(q, dscores, 2, 1) * c2
    dv_tile = pa._batched_dot(g, probs, 2, 1)

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = dk_tile.astype(dk_ref.dtype)
        dv_ref[...] = dv_tile.astype(dv_ref.dtype)

    @pl.when(qi != 0)
    def _():
        dk_ref[...] += dk_tile.astype(dk_ref.dtype)
        dv_ref[...] += dv_tile.astype(dv_ref.dtype)


def _call_bwd_current(qt, kt, vt, mask, g, emb, tq):
    bh, s, t = qt.shape
    scale = float(emb) ** -0.25
    nb = pa._choose_nb(bh, t, tq, budget_scale=0.5)
    grid, qspec, kvspec, mspec = pa._specs(bh, t, s, tq, nb)
    acc_dtype = jnp.float32 if (t // tq) > 1 else kt.dtype
    return pl.pallas_call(
        functools.partial(pa._bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct(kt.shape, acc_dtype),
            jax.ShapeDtypeStruct(vt.shape, acc_dtype),
        ),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, mspec, qspec],
        out_specs=(qspec, kvspec, kvspec),
    )(qt, kt, vt, mask, g)


def _call_bwd_lse(qt, kt, vt, mask, m, s_den, g, emb, tq):
    bh, s, t = qt.shape
    scale = float(emb) ** -0.25
    nb = pa._choose_nb(bh, t, tq, budget_scale=0.5)
    grid, qspec, kvspec, mspec = pa._specs(bh, t, s, tq, nb)
    rowspec = pl.BlockSpec((nb, tq), lambda i, qi: (i, qi),
                           memory_space=pa.pltpu.VMEM)
    acc_dtype = jnp.float32 if (t // tq) > 1 else kt.dtype
    return pl.pallas_call(
        functools.partial(_bwd_kernel_lse, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct(kt.shape, acc_dtype),
            jax.ShapeDtypeStruct(vt.shape, acc_dtype),
        ),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, mspec, rowspec, rowspec, qspec],
        out_specs=(qspec, kvspec, kvspec),
    )(qt, kt, vt, mask, m, s_den, g)


def timed_calls(body, q0, calls):
    """Scan `calls` invocations; carry flows through jnp.maximum into q."""

    @jax.jit
    def run(q0):
        def step(carry, _):
            dq, dk, dv = body(jnp.maximum(q0, carry))
            return dq * 1e-6, dv.astype(jnp.float32).sum()
        carry, outs = jax.lax.scan(step, q0, jnp.arange(calls))
        return outs

    outs = run(q0)
    float(np.asarray(outs[-1]))  # compile+run
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = run(q0)
        float(np.asarray(outs[-1]))
        times.append(time.perf_counter() - t0)
    return min(times) / calls


def run_case(name, b, heads, head_dim, t, emb, calls, results):
    bh, s = b * heads, head_dim
    tq = -(-t // 8) * 8
    t_pad = tq
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    qt, kt, vt, g = (mk((bh, s, t_pad)) for _ in range(4))
    lens = rng.integers(int(0.5 * t), t, size=bh)
    mask = jnp.asarray(np.arange(t_pad)[None, :] < lens[:, None])
    scale = float(emb) ** -0.25

    # lse residuals computed once outside the timed loop (the real fwd
    # kernel would emit these; here they are inputs)
    sc = (qt.astype(jnp.float32) * scale).transpose(0, 2, 1) @ (
        kt.astype(jnp.float32) * scale)
    sc = jnp.where(mask[:, None, :], sc, pa.MASK_FILL)
    m = sc.max(-1)
    s_den = jnp.exp(sc - m[:, :, None]).sum(-1)

    cur = timed_calls(
        lambda q: _call_bwd_current(q, kt, vt, mask, g, emb, tq), qt, calls)
    lse = timed_calls(
        lambda q: _call_bwd_lse(q, kt, vt, mask, m, s_den, g, emb, tq),
        qt, calls)
    results[name] = {
        "current_us": round(cur * 1e6, 1),
        "lse_us": round(lse * 1e6, 1),
        "speedup": round(cur / lse, 3),
        "harness": {"calls_per_scan": calls, "scans": 3,
                    "sync": "value-fetch", "round": "r3"},
    }
    print(name, results[name], flush=True)


def main():
    calls = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    results = {}
    # LC headline shapes: B=256, emb 64, 8 heads of dim 8, T=200
    run_case("lc_b256", 256, 8, 8, 200, 64, calls, results)
    # SP headline shapes: B=256, emb 32, 2 heads of dim 16, T=220
    run_case("sp_b256", 256, 2, 16, 220, 32, calls, results)
    # flagship batch
    run_case("lc_b1024", 1024, 8, 8, 200, 64, calls, results)
    out = os.path.join(os.path.dirname(__file__), "probe_bwd_lse.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
