"""Isolated probe: flash kernel NB (head-rows per program) sweep.

Hypothesis (r3 session-2): `_choose_nb` sizes NB from a per-buffer VMEM
score budget (4 MB fwd, 2 MB bwd), landing at NB=16 fwd / NB=8 bwd for the
LC headline shapes — 128 / 256 programs per call. At ~3 us of compute per
program the grid is near the granularity floor where per-program overhead
(block DMA issue, program dispatch) is a visible fraction; larger NB means
fewer programs and bigger batched dots at the SAME total FLOPs, trading
VMEM pressure for dispatch amortisation. This probe measures the real
per-call time of both kernels across NB, catching Mosaic compile failures
per variant, at the LC and SP headline shapes.

Usage: python benchmarks/probe_nb.py [calls]
Writes benchmarks/probe_nb.json.
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


def _call_fwd(qt, kt, vt, mask, emb, tq, nb):
    bh, s, t = qt.shape
    scale = float(emb) ** -0.25
    grid, qspec, kvspec, mspec = pa._specs(bh, t, s, tq, nb)
    return pl.pallas_call(
        functools.partial(pa._fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, mspec],
        out_specs=qspec,
    )(qt, kt, vt, mask)


def _call_bwd(qt, kt, vt, mask, g, emb, tq, nb):
    bh, s, t = qt.shape
    scale = float(emb) ** -0.25
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


def timed_fwd(body, q0, calls):
    @jax.jit
    def run(q0):
        def step(carry, _):
            out = body(jnp.maximum(q0, carry))
            return out * 1e-6, out.astype(jnp.float32).sum()
        carry, outs = jax.lax.scan(step, q0, jnp.arange(calls))
        return outs

    outs = run(q0)
    float(np.asarray(outs[-1]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = run(q0)
        float(np.asarray(outs[-1]))
        times.append(time.perf_counter() - t0)
    return min(times) / calls


def timed_bwd(body, q0, calls):
    @jax.jit
    def run(q0):
        def step(carry, _):
            dq, dk, dv = body(jnp.maximum(q0, carry))
            return dq * 1e-6, dv.astype(jnp.float32).sum()
        carry, outs = jax.lax.scan(step, q0, jnp.arange(calls))
        return outs

    outs = run(q0)
    float(np.asarray(outs[-1]))
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

    # the kernels' PRODUCTION selection (single source of truth)
    cur_fwd_nb = pa.fwd_nb(bh, t_pad, tq, s, jnp.dtype(dt).itemsize)
    cur_bwd_nb = pa.bwd_nb(bh, t_pad, tq, s, jnp.dtype(dt).itemsize)
    case = {"current_fwd_nb": cur_fwd_nb, "current_bwd_nb": cur_bwd_nb,
            "fwd_us": {}, "bwd_us": {},
            "harness": {"calls_per_scan": calls, "scans": 3,
                        "sync": "value-fetch", "round": "r3s2"}}
    for nb in (8, 16, 32, 64, 128):
        if bh % nb:
            continue
        try:
            us = timed_fwd(
                lambda q: _call_fwd(q, kt, vt, mask, emb, tq, nb), qt, calls)
            case["fwd_us"][str(nb)] = round(us * 1e6, 1)
        except Exception as err:  # Mosaic compile failure at large NB
            case["fwd_us"][str(nb)] = f"FAIL: {type(err).__name__}"
        try:
            us = timed_bwd(
                lambda q: _call_bwd(q, kt, vt, mask, g, emb, tq, nb), qt, calls)
            case["bwd_us"][str(nb)] = round(us * 1e6, 1)
        except Exception as err:
            case["bwd_us"][str(nb)] = f"FAIL: {type(err).__name__}"
        print(name, nb, case["fwd_us"].get(str(nb)), case["bwd_us"].get(str(nb)),
              flush=True)
    results[name] = case


def main():
    calls = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    results = {}
    # LC headline shapes: B=256, emb 64, 8 heads of dim 8, T=200
    run_case("lc_b256", 256, 8, 8, 200, 64, calls, results)
    # SP headline shapes: B=256, emb 32, 2 heads of dim 16, T=220
    run_case("sp_b256", 256, 2, 16, 220, 32, calls, results)
    out = os.path.join(os.path.dirname(__file__), "probe_nb.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
