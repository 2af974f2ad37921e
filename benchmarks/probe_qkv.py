"""Isolated probe: fused in-kernel-QKV attention vs the production path.

Hypothesis (r3 verdict, Weak #1): the flash kernel's custom-call boundary
forces (B,H,T,S) <-> (BH,S,T) relayouts that cost ~1.6 ms/step @B=256 and
~13 ms of copy/convert traffic @B=1024. Moving the QKV projection + head
fold + unify INSIDE the kernel (ops/qkv_attention.py) consumes the layer
input in its native (B,T,E) layout and removes the boundary entirely.

This probe measures, on the real chip, the FULL per-layer attention cost
(projections + attention + unify) for both paths at the LC and SP headline
shapes, forward and forward+backward, at B=256 and B=1024 — plus an
on-chip parity check of the fused kernel against the dense XLA math.

Usage: python benchmarks/probe_qkv.py [calls]
Writes benchmarks/probe_qkv.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.ops.attention import attention, dense_attention
from multimodal_supernovae_tpu.ops.qkv_attention import fused_qkv_attention


def current_path(x, mask, wq, wk, wv, wu, bu, heads, emb, use_pallas=True):
    """The production composition: XLA projections -> flash kernel (with its
    boundary relayouts) -> XLA unify."""
    b, t, e = x.shape
    s = e // heads
    cdt = x.dtype
    q, k, v = (x @ wq.astype(cdt), x @ wk.astype(cdt), x @ wv.astype(cdt))

    def to_heads(a):
        return a.reshape(b, t, heads, s).transpose(0, 2, 1, 3)

    out = attention(to_heads(q), to_heads(k), to_heads(v), mask, emb=emb,
                    use_pallas=use_pallas)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, e)
    return out @ wu.astype(cdt) + bu.astype(cdt)


def fused_path(x, mask, wq, wk, wv, wu, bu, heads, emb):
    return fused_qkv_attention(x, mask, wq, wk, wv, wu, bu, heads, emb)


def timed(fn, args, calls, grad=False):
    """Scanned repeated calls, min-of-3 scans, value-fetch sync."""
    x0 = args[0]

    if grad:
        def one(x):
            loss, grads = jax.value_and_grad(
                lambda x, wq, wk, wv, wu, bu: jnp.sum(
                    fn(x, args[1], wq, wk, wv, wu, bu, *args[7:]) ** 2
                ).astype(jnp.float32),
                argnums=(0, 1, 2, 3, 4, 5),
            )(x, *args[2:7])
            return grads[0], loss
    else:
        def one(x):
            out = fn(x, *args[1:])
            return out, out.astype(jnp.float32).sum()

    @jax.jit
    def run(x0):
        def step(carry, _):
            out, val = one(carry * 1e-6 + x0)
            return out.astype(x0.dtype), val
        _, vals = jax.lax.scan(step, x0, jnp.arange(calls))
        return vals

    vals = run(x0)
    float(np.asarray(vals[-1]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        vals = run(x0)
        float(np.asarray(vals[-1]))
        times.append(time.perf_counter() - t0)
    return min(times) / calls


def run_case(name, b, heads, t, e, calls, results):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, t, e)), dt)
    lens = rng.integers(int(0.5 * t), t, size=b)
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    ws = [jnp.asarray(rng.standard_normal((e, e)) / np.sqrt(e), jnp.float32)
          for _ in range(4)]
    bu = jnp.asarray(rng.standard_normal((e,)) * 0.01, jnp.float32)
    args = (x, mask, *ws, bu, heads, e)

    # on-chip parity vs dense math (bf16 tolerance)
    want = np.asarray(
        current_path(x, mask, *ws, bu, heads, e, use_pallas=False),
        np.float32)
    got = np.asarray(fused_path(*args), np.float32)
    denom = max(1.0, float(np.abs(want).max()))
    parity = float(np.abs(got - want).max()) / denom
    case = {"parity_rel_err": parity, "fwd_us": {}, "fwdbwd_us": {},
            "harness": {"calls_per_scan": calls, "scans": 3,
                        "sync": "value-fetch", "round": "r4"}}
    for label, fn in (("current", current_path), ("fused_qkv", fused_path)):
        try:
            case["fwd_us"][label] = round(timed(fn, args, calls) * 1e6, 1)
        except Exception as err:
            case["fwd_us"][label] = f"FAIL: {type(err).__name__}: {err}"[:300]
        try:
            case["fwdbwd_us"][label] = round(
                timed(fn, args, calls, grad=True) * 1e6, 1)
        except Exception as err:
            case["fwdbwd_us"][label] = f"FAIL: {type(err).__name__}: {err}"[:300]
        print(name, label, case["fwd_us"].get(label),
              case["fwdbwd_us"].get(label), flush=True)
    results[name] = case


def main():
    calls = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    results = {}
    run_case("lc_b256", 256, 8, 200, 64, calls, results)
    run_case("sp_b256", 256, 2, 220, 32, calls, results)
    run_case("lc_b1024", 1024, 8, 200, 64, max(calls // 4, 16), results)
    run_case("sp_b1024", 1024, 2, 220, 32, max(calls // 4, 16), results)
    out = os.path.join(os.path.dirname(__file__), "probe_qkv.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
