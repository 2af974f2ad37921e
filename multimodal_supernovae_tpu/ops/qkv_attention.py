"""Pallas TPU attention with the QKV/unify projections INSIDE the kernel.

Why: the flash kernel (ops/pallas_attention.py) consumes pre-projected
(B, H, T, S) q/k/v, which forces (B, H, T, S) <-> (B*H, S, T) relayouts at
the custom-call boundary — Pallas/Mosaic cannot negotiate operand layouts
with XLA, so every call pays bandwidth-floor copies on both sides (measured
~1.6 ms/step @B=256 and ~13 ms of copy/convert traffic @B=1024 of the
70 ms step — benchmarks/PERF.md round 3, trace_attrib_b1024.json). Moving
the boundary kills them: this kernel consumes the LAYER INPUT x in its
native (B, T, E) layout and emits the post-unify output in the same layout,
so XLA sees a plain elementwise-compatible op with zero relayouts — and
q/k/v never round-trip through HBM at all.

Design (second iteration — the first ran one sample per program and lost
~2 us/program of grid overhead at the SP tower's tiny per-sample work;
benchmarks/probe_qkv.json r4):
  * q/k/v projections are ONE dot against a pre-concatenated (C, 3E)
    weight with the reference's emb**-0.25 q/k scaling folded in OUTSIDE
    the custom-vjp boundary (the fold lives in the autodiff graph, so
    weight grads chain exactly); inside the kernel the batched dot_general
    emits (NB, 3E, Tp) — E on sublanes — so the q/k/v split and the head
    fold are tile-aligned sublane slices/reshapes, never relayouts.
  * grid = (B/NB,): NB samples per program, sized to a VMEM score budget
    (same policy as the flash kernel's rows-per-program) to amortise
    per-program overhead at small-head shapes.
  * attention math is the flash kernel's proven batched-(S, T) formulation:
    out-normalised forward softmax, probs-softmax backward — the measured
    round-3 winners.
  * weights live in VMEM for the whole kernel (constant index_map blocks,
    passed in PARAM dtype and cast to the compute dtype in-kernel, so the
    custom-VJP weight grads stay f32 end-to-end like flax's own path).
  * backward = one kernel: full recompute (residuals are just x, mask and
    the weights), dx formed by one (3E-contraction) dot, weight grads
    accumulated across the sequential TPU grid (zero-init at program 0,
    += after) exactly like ops/fused_block.py.
  * single q-tile only: ceil8(T) <= 256 covers every reference sequence
    (LC 200 -> 208, SP 220 -> 224); longer sequences fall back to the
    flash kernel via ``supports``.

Semantics match ops/attention.py:dense_attention + unify exactly (the
reference's full SelfAttention, src/transformer_utils.py:8-89): q and k
scaled by emb**-0.25, padded KEY positions set to -1e7 before the softmax,
f32 score accumulation, biased head-unification.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e7
MAX_TQ = 256  # single-q-tile ceiling; longer sequences use the flash kernel
# Per-kernel f32 score-buffer budgets driving samples-per-program (NB), in
# the spirit of pallas_attention._choose_nb. The backward holds ~2x the
# score-sized live buffers (scores/probs/dprobs/dscores with partial reuse).
_FWD_SCORE_BUDGET = 6 * 1024 * 1024
_BWD_SCORE_BUDGET = 8 * 1024 * 1024
_FWD_SCORE_BUFS = 2
_BWD_SCORE_BUFS = 4


def _bdot(a, b, ca, cb):
    """dot_general with leading batch dim 0 on both operands, f32 acc."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _lane_pad(t: int) -> int:
    return -(-t // 128) * 128


def choose_nb(b: int, heads: int, tp: int, budget: int, bufs: int) -> int:
    """Samples per program: score-tile f32 bytes (lane-padded) within the
    VMEM budget, dividing the batch."""
    env = os.environ.get("MMSN_QKV_VMEM_BUDGET")
    if env is not None:
        budget = int(env)
    per_sample = bufs * 4 * heads * tp * _lane_pad(tp)
    nb = max(1, min(8, budget // per_sample, b))
    while b % nb:
        nb -= 1
    return nb


def fwd_nb(b: int, heads: int, tp: int) -> int:
    return choose_nb(b, heads, tp, _FWD_SCORE_BUDGET, _FWD_SCORE_BUFS)


def bwd_nb(b: int, heads: int, tp: int) -> int:
    return choose_nb(b, heads, tp, _BWD_SCORE_BUDGET, _BWD_SCORE_BUFS)


def _project(wqkv_c, x):
    """(NB, 3E, Tp) = W^T @ x^T, batched over samples: contract x (NB, Tp, C)
    with the broadcast weight (NB, C, 3E) — the dot emits E on sublanes, so
    head split/merge are tile-aligned."""
    nb = x.shape[0]
    wb = jnp.broadcast_to(wqkv_c, (nb,) + wqkv_c.shape)
    return _bdot(wb, x, 1, 2)  # (NB, 3E, Tp) f32


def _heads3(a, nb, heads, s, tp):
    """(NB, E, Tp) -> (NB*H, S, Tp): pure view change (row order (n, e) ==
    (n, h, s)); S % 8 == 0 keeps sublane tiles aligned."""
    return a.reshape(nb * heads, s, tp)


def _fwd_kernel(x_ref, mask_ref, wqkv_ref, wu_ref, bu_ref, out_ref,
                *, heads: int):
    # blocks: x (NB, Tp, E); mask (NB*H, 1, Tp) — pre-broadcast to head-rows
    # outside the kernel (loop-invariant, XLA CSEs it across layers);
    # wqkv (E, 3E); wu (E, E); bu (1, E)
    nb, tp, e = x_ref.shape
    s = e // heads
    cdt = x_ref.dtype
    x = x_ref[...]

    qkv = _project(wqkv_ref[...].astype(cdt), x).astype(cdt)  # (NB, 3E, Tp)
    qh = _heads3(qkv[:, :e, :], nb, heads, s, tp)
    kh = _heads3(qkv[:, e:2 * e, :], nb, heads, s, tp)
    vh = _heads3(qkv[:, 2 * e:, :], nb, heads, s, tp)

    scores = _bdot(qh, kh, 1, 1)                   # (NB*H, Tp, Tp) f32
    m3 = mask_ref[...]                             # (NB*H, 1, Tp)
    scores = jnp.where(m3, scores, MASK_FILL)
    # out-normalised softmax (r3 winner): normalise the small (H, S, Tp)
    # output instead of the 25x-larger probability tensor.
    mx = jnp.max(scores, axis=-1)                  # (NB*H, Tp)
    ex = jnp.exp(scores - mx[:, :, None])          # masked keys: exactly 0
    sm = jnp.sum(ex, axis=-1)                      # (NB*H, Tp)
    att = _bdot(vh, ex.astype(cdt), 2, 2)          # (NB*H, S, Tp) f32
    att = (att / sm[:, None, :]).astype(cdt).reshape(nb, e, tp)

    wu_b = jnp.broadcast_to(wu_ref[...].astype(cdt), (nb, e, e))
    out = _bdot(att, wu_b, 1, 1)                   # (NB, Tp, E) f32
    out_ref[...] = (out.astype(cdt)
                    + bu_ref[...].astype(cdt)[None]).astype(out_ref.dtype)


def _bwd_kernel(x_ref, mask_ref, wqkv_ref, wu_ref, g_ref,
                dx_ref, dwqkv_ref, dwu_ref, dbu_ref, *, heads: int):
    nb, tp, e = x_ref.shape
    s = e // heads
    cdt = x_ref.dtype
    x = x_ref[...]
    g = g_ref[...]                                 # (NB, Tp, E)
    wqkv = wqkv_ref[...].astype(cdt)
    wu = wu_ref[...].astype(cdt)

    # ---- recompute forward ------------------------------------------------
    qkv = _project(wqkv, x).astype(cdt)
    qh = _heads3(qkv[:, :e, :], nb, heads, s, tp)
    kh = _heads3(qkv[:, e:2 * e, :], nb, heads, s, tp)
    vh = _heads3(qkv[:, 2 * e:, :], nb, heads, s, tp)

    scores = _bdot(qh, kh, 1, 1)                   # (NB*H, Tp, Tp) f32
    m3 = mask_ref[...]                             # (NB*H, 1, Tp)
    scores = jnp.where(m3, scores, MASK_FILL)
    # backward keeps jax.nn.softmax — the manual forms measured slower here
    # (benchmarks/PERF.md r3)
    probs = jax.nn.softmax(scores, axis=-1)        # (NB*H, Tp, Tp) f32
    probs_c = probs.astype(cdt)
    att = _bdot(vh, probs_c, 2, 2).astype(cdt).reshape(nb, e, tp)

    # ---- unify backward ----------------------------------------------------
    # d_att^T (NB, E, Tp) = Wu @ g^T; dWu = sum_n att g; dbu = sum g
    wu_b = jnp.broadcast_to(wu, (nb, e, e))
    dattT = _bdot(wu_b, g, 2, 2).astype(cdt)       # (NB, E, Tp)
    dwu = jnp.sum(_bdot(att, g, 2, 1), axis=0)     # (E, E) f32
    dbu = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).reshape(1, e)

    # ---- attention backward ------------------------------------------------
    gh = _heads3(dattT, nb, heads, s, tp)
    dprobs = _bdot(gh, vh, 1, 1)                   # (NB*H, Tp, Tp) f32
    dscores = probs * (dprobs - jnp.sum(probs * dprobs, axis=-1,
                                        keepdims=True))
    dscores = jnp.where(m3, dscores, 0.0).astype(cdt)

    dqT = _bdot(kh, dscores, 2, 2).astype(cdt).reshape(nb, e, tp)
    dkT = _bdot(qh, dscores, 2, 1).astype(cdt).reshape(nb, e, tp)
    dvT = _bdot(gh, probs_c, 2, 1).astype(cdt).reshape(nb, e, tp)
    dqkvT = jnp.concatenate([dqT, dkT, dvT], axis=1)  # (NB, 3E, Tp)

    # ---- projection backward (one 3E-contraction dot each) -----------------
    wqkv_b = jnp.broadcast_to(wqkv, (nb,) + wqkv.shape)
    dx = _bdot(dqkvT, wqkv_b, 1, 2)                # (NB, Tp, C) f32
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dwqkv = jnp.sum(_bdot(x, dqkvT, 1, 2), axis=0)  # (C, 3E) f32

    updates = ((dwqkv_ref, dwqkv), (dwu_ref, dwu), (dbu_ref, dbu))
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref, val in updates:
            ref[...] = val

    @pl.when(i != 0)
    def _():
        for ref, val in updates:
            ref[...] += val


def _specs(nb, tp, e, heads):
    xspec = pl.BlockSpec((nb, tp, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((nb * heads, 1, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return xspec, mspec, full


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _qkv_attn(x, mask, wqkv, wu, bu, heads: int):
    return _qkv_fwd_impl(x, mask, wqkv, wu, bu, heads)


def _qkv_fwd_impl(x, mask, wqkv, wu, bu, heads):
    b, tp, e = x.shape
    nb = fwd_nb(b, heads, tp)
    xspec, mspec, full = _specs(nb, tp, e, heads)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // nb,),
        in_specs=[xspec, mspec, full((e, 3 * e)), full((e, e)),
                  full((1, e))],
        out_specs=xspec,
    )(x, mask, wqkv, wu, bu)


def _qkv_fwd(x, mask, wqkv, wu, bu, heads):
    out = _qkv_fwd_impl(x, mask, wqkv, wu, bu, heads)
    return out, (x, mask, wqkv, wu, bu)


def _qkv_bwd(heads, residuals, g):
    x, mask, wqkv, wu, bu = residuals
    b, tp, e = x.shape
    nb = bwd_nb(b, heads, tp)
    xspec, mspec, full = _specs(nb, tp, e, heads)

    def acc(shape):
        return (jax.ShapeDtypeStruct(shape, jnp.float32),
                pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                             memory_space=pltpu.VMEM))

    out_shapes, out_specs = zip(
        (jax.ShapeDtypeStruct(x.shape, x.dtype), xspec),  # dx
        acc((e, 3 * e)), acc((e, e)), acc((1, e)),        # dwqkv dwu dbu
    )
    dx, dwqkv, dwu, dbu = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads),
        out_shape=tuple(out_shapes),
        grid=(b // nb,),
        in_specs=[xspec, mspec, full((e, 3 * e)), full((e, e)), xspec],
        out_specs=tuple(out_specs),
    )(x, mask, wqkv, wu, g)
    return (dx, None, dwqkv.astype(wqkv.dtype), dwu.astype(wu.dtype),
            dbu.astype(bu.dtype))


_qkv_attn.defvjp(_qkv_fwd, _qkv_bwd)


def supports(t: int, e: int, heads: int) -> bool:
    """Single q-tile, sublane-multiple head dim and emb."""
    if heads <= 0 or e % heads or (e // heads) % 8 or e % 8:
        return False
    return -(-t // 8) * 8 <= MAX_TQ


def fused_qkv_attention(x, mask, wq, wk, wv, wu, bu, heads: int,
                        emb: int = None):
    """Full reference SelfAttention as ONE kernel: qkv projection + head
    fold + masked flash attention + biased unify.

    Args:
      x: (B, T, E) layer input in its native layout (any float dtype —
         weights are cast to x.dtype in-kernel like ``nn.Dense(dtype=...)``).
      mask: (B, T) bool key-validity mask, or None (all valid).
      wq/wk/wv/wu: (E, E) flax-orientation kernels in PARAM dtype.
      bu: (E,) unify bias.
      heads: head count (E % heads == 0, head_dim % 8 == 0).
      emb: full embedding dim for the reference's e**-0.25 scaling
           (defaults to E).

    Returns: (B, T, E) post-unify attention output, same dtype as x.
    """
    b, t, e = x.shape
    if emb is None:
        emb = e
    tp = -(-t // 8) * 8
    assert tp <= MAX_TQ, "use the flash kernel for longer sequences"
    if mask is None:
        mask = jnp.ones((b, t), dtype=bool)
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, tp - t)))
    # Fold the reference's e**-0.25 q/k scaling into the weights (in PARAM
    # dtype, f32) and pack one (C, 3E) projection weight. Living in the
    # autodiff graph, the fold chains the weight grads exactly.
    scale = float(emb) ** -0.25
    wqkv = jnp.concatenate([wq * scale, wk * scale, wv], axis=1)
    # mask pre-broadcast to head-rows (B*H, 1, Tp): loop-invariant across
    # layers, so XLA materialises it once per step.
    maskh = jnp.broadcast_to(
        mask[:, None, :], (b, heads, mask.shape[-1])
    ).reshape(b * heads, 1, mask.shape[-1])
    out = _qkv_attn(x, maskh, wqkv, wu, bu.reshape(1, e), heads)
    return out[:, :t, :]
