"""Pallas TPU fused attention for the sequence encoders.

Why: XLA materialises the (B, H, T, T) score tensor in HBM between the QK^T
and PV matmuls — at B=1024 that is ~1.3 GB per light-curve layer, and the
whole train step is score-traffic bound (benchmarks/profile_tpu.py). This
kernel keeps score tiles entirely in VMEM and writes only (T, S) outputs.

Two lessons from profiling earlier versions on v5e shaped this design:

  1. LAYOUT. The reference's head dims are tiny (8-32). In the natural
     (T, S) layout the (8, 128) tile grid pads S to 128 lanes — a 16x
     memory expansion that made v1 LOSE to XLA 3x. The kernel therefore
     operates on q/k/v TRANSPOSED to (BH, S, T): head_dim on sublanes
     (8-multiple, tile-exact), sequence on lanes.
  2. GRID GRANULARITY. One program per (batch, head) pair means tens of
     thousands of tiny programs per step; dispatch overhead dominated v2.
     The grid therefore blocks NB head-rows per program and runs BATCHED
     dot_generals (batch dim NB) inside the kernel, sizing NB to a VMEM
     budget.

Semantics match ops/attention.py:dense_attention exactly (the reference's
MHSA math): q and k scaled by emb**-0.25, padded KEY positions set to -1e7
before the softmax, f32 score accumulation.

Backward is a second kernel (custom_vjp): per q-tile it recomputes the
probabilities in VMEM and forms dq directly plus dk/dv accumulated across
q-tiles (TPU grid iteration is sequential, so revisiting the same output
block is safe: zero-init at the first q-tile, add thereafter).

Sequences of any length are accepted: T pads to a q-tile multiple with
masked-out keys; padded query rows are sliced away after the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

MASK_FILL = -1e7
DEFAULT_TQ = 256
# Per-buffer f32 score bytes driving rows-per-program. The env override
# (MMSN_FLASH_VMEM_BUDGET) is read at CALL time inside _choose_nb, never
# baked in here: an env value present at import would otherwise masquerade
# as the default after a harness pops the var (benchmarks/profile_tpu.py
# sets and pops it per-variant).
_SCORE_VMEM_BUDGET = 4 * 1024 * 1024
# The FORWARD kernel defaults to a tighter budget: the NB sweep
# (benchmarks/probe_nb.py, r3) measured NB=8 fastest for the forward at the
# LC headline shapes (499 vs 530 us/call at NB=16; full step 16.10 ->
# 15.96 ms) while the backward showed no gain above NB=8 — smaller score
# tiles leave more VMEM for Mosaic's input double-buffering. An explicit
# MMSN_FLASH_VMEM_BUDGET still overrides both kernels.
_FWD_VMEM_BUDGET = 1536 * 1024


def _batched_dot(a, b, contract_a, contract_b):
    """dot_general with leading batch dim 0 on both operands."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _apply_mask(scores, mask_ref):
    """Fill padded-key scores with MASK_FILL (select formulation).

    The 'fold the fill into the score-dot epilogue as an additive f32 bias
    row' candidate (round-2 notes) was built and REJECTED in r3: the
    (NB, 1, T) f32 bias broadcast-add fails to lower on v5e Mosaic
    (vector_extract_slice layout check crash), and the additive form also
    changes fully-masked-row semantics (adding -1e7 preserves raw score
    differences, so such rows would no longer get the reference's uniform
    weights). Inside the kernel both forms are a single VPU pass over the
    score tile anyway — there is no separate epilogue to save
    (benchmarks/PERF.md r3)."""
    return jnp.where(mask_ref[...][:, None, :], scores, MASK_FILL)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    # blocks: q (NB, S, TQ); k, v (NB, S, T); mask (NB, T)
    # Dots keep the INPUT dtype with f32 accumulation: bf16 operands run the
    # MXU ~4-6x faster than upcast-f32 at these tiny contractions, and match
    # the dense path (which scales q/k in bf16 before its einsum) bit-closer.
    q = q_ref[...] * scale
    k = k_ref[...] * scale
    scores = _batched_dot(q, k, 1, 1)  # (NB, TQ, T) f32
    scores = _apply_mask(scores, mask_ref)
    # OUT-NORMALIZED softmax (r3, measured 17% faster than jax.nn.softmax
    # here): divide the (NB, S, TQ) OUTPUT by the softmax denominator
    # instead of the 25x-larger (NB, TQ, T) probability tensor — the VPU
    # softmax chain is 42% of this kernel (benchmarks/PERF.md r3), and the
    # big-tensor divide pass is the removable part. Keepdims-free
    # reductions keep TQ on lanes for the row broadcasts.
    m = jnp.max(scores, axis=-1)                 # (NB, TQ)
    e = jnp.exp(scores - m[:, :, None])          # masked keys: exactly 0
    s = jnp.sum(e, axis=-1)                      # (NB, TQ)
    # out^T = v @ e^T / s -> (NB, S, TQ)
    out = _batched_dot(v_ref[...], e.astype(v_ref.dtype), 2, 2)
    out_ref[...] = (out / s[:, None, :]).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    qi = pl.program_id(1)
    # native-dtype MXU operands, f32 accumulation (see _fwd_kernel note)
    q = q_ref[...]  # (NB, S, TQ), UNscaled
    k = k_ref[...]  # (NB, S, T)
    v = v_ref[...]
    g = g_ref[...]  # (NB, S, TQ): cotangent of out^T
    c2 = scale * scale

    scores = _batched_dot(q * scale, k * scale, 1, 1)  # (NB, TQ, T) f32
    scores = _apply_mask(scores, mask_ref)
    # The backward keeps jax.nn.softmax: the r3 unnormalised-softmax
    # rewrite (fold 1/s into the small dot operands, never materialise
    # probs) measured SLOWER here — 933 us/call vs 857, and 960 with
    # keepdims reductions — jax.nn.softmax's lowering beats both manual
    # forms in this kernel (benchmarks/PERF.md r3). Only the FORWARD keeps
    # the out-normalised form, where it wins 19%.
    probs = jax.nn.softmax(scores, axis=-1)

    dprobs = _batched_dot(g, v, 1, 1)  # (NB, TQ, T) f32
    dscores = probs * (dprobs - jnp.sum(probs * dprobs, axis=-1,
                                        keepdims=True))
    # where(mask, scores, FILL) passes no gradient to masked scores; zeroing
    # here matters for FULLY-masked rows, whose probs are uniform (not ~0)
    dscores = jnp.where(mask_ref[...][:, None, :], dscores, 0.0).astype(q.dtype)
    probs = probs.astype(v.dtype)

    # dq^T = k @ dS^T (NB, S, TQ); dk^T = q @ dS (NB, S, T); dv^T = g @ P
    dq_ref[...] = (_batched_dot(k, dscores, 2, 2) * c2).astype(dq_ref.dtype)
    dk_tile = _batched_dot(q, dscores, 2, 1) * c2
    dv_tile = _batched_dot(g, probs, 2, 1)

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = dk_tile.astype(dk_ref.dtype)
        dv_ref[...] = dv_tile.astype(dv_ref.dtype)

    @pl.when(qi != 0)
    def _():
        dk_ref[...] += dk_tile.astype(dk_ref.dtype)
        dv_ref[...] += dv_tile.astype(dv_ref.dtype)


def _choose_nb(bh: int, t: int, tq: int, budget_scale: float = 1.0,
               default_budget: int = None, io_row_bytes: int = 0,
               score_bufs: int = 2) -> int:
    """Rows per program: within the VMEM score budget, a multiple of 8 (the
    mask block's sublane divisibility requirement), dividing bh.

    ``budget_scale``: the backward kernel holds ~2x the score-sized live
    buffers of the forward (scores+probs+dprobs+dscores with partial
    reuse), so it halves the budget — fewer rows per program, but within
    the 16 MB scoped-vmem ceiling.

    ``default_budget``: per-kernel default used when MMSN_FLASH_VMEM_BUDGET
    is NOT set (the forward passes the tighter ``_FWD_VMEM_BUDGET``); an
    explicit env var overrides it so the documented knob sweeps both
    kernels.

    ``io_row_bytes``/``score_bufs``: the score budget alone undercounts
    VMEM at SHORT sequences — small t*tq makes nb huge, and the per-program
    block I/O (double-buffered by Mosaic) then overflows the 16 MB ceiling
    by itself (observed: the bwd kernel at the ViT tower's t=36, s=32,
    bh=1024 picked nb=256 and failed remote compile; nb=128 compiles).
    Callers pass the bytes of block inputs+outputs per head-row so the
    TOTAL estimate (2x-buffered I/O + f32 score-sized temporaries) is kept
    under a conservative ceiling. At the reference's LC/SP shapes nb is
    already 8, so this cap never binds there.
    """
    env = os.environ.get("MMSN_FLASH_VMEM_BUDGET")
    if env is not None:
        budget = int(env)
    else:
        budget = default_budget if default_budget else _SCORE_VMEM_BUDGET
    budget = int(budget * budget_scale)
    nb = max(8, budget // (4 * tq * t) // 8 * 8)
    nb = min(nb, bh)
    ceiling = 10 * 1024 * 1024
    while nb > 8 and nb * (score_bufs * 4 * tq * t + 2 * io_row_bytes) > ceiling:
        nb -= 8
    while nb > 8 and bh % nb:
        nb -= 8
    return nb


def fwd_nb(bh: int, t: int, tq: int, s: int, itemsize: int = 2) -> int:
    """The forward kernel's production NB selection (shape -> rows per
    program). The single source of truth: called by _flash_fwd_impl, the
    regression tests, and benchmarks/probe_nb.py, so tuning changes cannot
    drift apart from what is tested/published."""
    # blocks per head-row: q + out (s*tq each), k + v (s*t each), mask (t)
    io_row = itemsize * (2 * s * tq + 2 * s * t) + t
    return _choose_nb(bh, t, tq, default_budget=_FWD_VMEM_BUDGET,
                      io_row_bytes=io_row, score_bufs=2)


def bwd_nb(bh: int, t: int, tq: int, s: int, itemsize: int = 2) -> int:
    """The backward kernel's production NB selection (see fwd_nb)."""
    # blocks per head-row: q + g + dq (s*tq each), k + v + dk + dv (s*t), mask
    io_row = itemsize * (3 * s * tq + 4 * s * t) + t
    return _choose_nb(bh, t, tq, budget_scale=0.5,
                      io_row_bytes=io_row, score_bufs=4)


def _specs(bh, t, s, tq, nb):
    grid = (bh // nb, t // tq)
    qspec = pl.BlockSpec((nb, s, tq), lambda i, qi: (i, 0, qi),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((nb, s, t), lambda i, qi: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((nb, t), lambda i, qi: (i, 0),
                         memory_space=pltpu.VMEM)
    return grid, qspec, kvspec, mspec


def flash_attention(q, k, v, key_mask, emb: int, tq: int = DEFAULT_TQ):
    """Fused masked attention. q/k/v: (B, H, T, S); key_mask: (B, T) bool or
    None; returns (B, H, T, S). ``emb`` drives the reference's e**-0.25
    scaling (the FULL embedding dim, not S)."""
    b, h, t, s = q.shape
    t8 = -(-t // 8) * 8
    if t8 <= tq:
        # q rows need only sublane (8) alignment: tiling at ceil8(T) instead
        # of the 128-lane multiple avoids up to 28% dead score/softmax rows
        # (T=200: 200 vs 256; T=220: 224 vs 256) — measured 0.37 ms/layer
        # on v5e. The key/lane axis still pads to 128 internally.
        tq = t8
    else:
        tq = min(tq, -(-t // 128) * 128)
    t_pad = -(-t // tq) * tq
    if key_mask is None:
        key_mask = jnp.ones((b, t), dtype=bool)
    # (B, H, T, S) -> (B*H, S, T) and broadcast the mask to head-rows
    def to_st(a):
        return jnp.swapaxes(a, 2, 3).reshape(b * h, s, t)

    qt, kt, vt = to_st(q), to_st(k), to_st(v)
    mask = jnp.broadcast_to(key_mask[:, None, :], (b, h, t)).reshape(b * h, t)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t)]
        qt, kt, vt = (jnp.pad(a, pad) for a in (qt, kt, vt))
        mask = jnp.pad(mask, [(0, 0), (0, t_pad - t)])
    out_t = _flash_attention_st(qt, kt, vt, mask, emb, tq)
    out = out_t[:, :, :t].reshape(b, h, s, t)
    return jnp.swapaxes(out, 2, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_st(qt, kt, vt, mask, emb: int, tq: int):
    return _flash_fwd_impl(qt, kt, vt, mask, emb, tq)


def _flash_fwd_impl(qt, kt, vt, mask, emb, tq):
    bh, s, t = qt.shape
    scale = float(emb) ** -0.25
    nb = fwd_nb(bh, t, tq, s, qt.dtype.itemsize)
    grid, qspec, kvspec, mspec = _specs(bh, t, s, tq, nb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, mspec],
        out_specs=qspec,
    )(qt, kt, vt, mask)


def _flash_fwd(qt, kt, vt, mask, emb, tq):
    return _flash_fwd_impl(qt, kt, vt, mask, emb, tq), (qt, kt, vt, mask)


def _flash_bwd(emb, tq, residuals, g):
    qt, kt, vt, mask = residuals
    bh, s, t = qt.shape
    scale = float(emb) ** -0.25
    nb = bwd_nb(bh, t, tq, s, qt.dtype.itemsize)
    grid, qspec, kvspec, mspec = _specs(bh, t, s, tq, nb)
    # dk/dv accumulate across q-tiles, so they need f32 outputs ONLY when
    # the grid revisits them (t > tq). At the reference's sequence lengths
    # there is exactly one q-tile, and emitting bf16 directly saves a
    # whole-tensor convert pass after the kernel (traced at 78 MB / 150 us
    # per LC bwd call at B=1024 — benchmarks/trace_attrib.py r3).
    acc_dtype = jnp.float32 if (t // tq) > 1 else kt.dtype
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct(kt.shape, acc_dtype),
            jax.ShapeDtypeStruct(vt.shape, acc_dtype),
        ),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, mspec, qspec],
        out_specs=(qspec, kvspec, kvspec),
    )(qt, kt, vt, mask, g)
    return dq, dk.astype(kt.dtype), dv.astype(vt.dtype), None


_flash_attention_st.defvjp(_flash_fwd, _flash_bwd)


def supports(t: int, s: int = 8, bh: int = 8) -> bool:
    """Head dim and batch*heads must be sublane multiples; any sequence
    length works."""
    return s % 8 == 0 and bh % 8 == 0
