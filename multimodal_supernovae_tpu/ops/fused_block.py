"""Fused Pallas TPU kernels for the post-norm transformer block.

The reference block (src/transformer_utils.py:92-116) is

    att = unify(MHSA(x))            # e**-0.25 q/k scaling, -1e7 key fill
    x1  = LN1(att + x)
    y   = LN2(relu(x1 @ Wf1 + bf1) @ Wf2 + bf2 + x1)

Attention itself already runs as the flash kernel (ops/pallas_attention.py).
Everything AFTER the raw attention output is ROW-LOCAL — each (b, t) row is
independent — which makes it ideal for one fused kernel: ``fused_ffn_block``
computes unify -> +x -> LN1 -> FF -> +residual -> LN2 in a single pass over
row tiles, eliminating the ~10 HBM round trips per layer the unfused XLA
lowering takes between those ops.

Design (second iteration — the first fused the WHOLE block at one sample
per grid program and lost 2x to small-dot latency; benchmarks r2):
  * flatten (B, T, E) -> (B*T, E) rows; grid over row tiles of R=1024.
    Every matmul is (R, E) @ (E, F): M=1024 fills MXU rows, natural layout,
    zero transposes, no per-head slicing.
  * weights live in VMEM for the whole kernel (constant index_map blocks).
  * backward = one kernel, full row-local recompute (residual = att and x
    only), weight grads accumulated across the sequential TPU grid
    (zero-init at program 0, += after).

Numerics match the unfused flax path: dots accumulate in f32 with one
rounding to the compute dtype, LayerNorm statistics in f32 with flax's
fast-variance form E[x^2]-E[x]^2, relu-gradient compare in f32 (Mosaic/v5e
rejects bf16 cmpf).

``fused_transformer_block`` composes qkv projection + flash attention +
``fused_ffn_block`` into the full reference block; models/transformer.py
routes through it on TPU whenever dropout is inactive.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024


def _dot(a, b):
    """2-D matmul, f32 accumulation, native-dtype operands on the MXU."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tt(a, b):
    """a^T @ b for weight grads: contract the ROW dim of both (R, M), (R, N)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _layernorm_rows(r, g, b, eps):
    """LayerNorm over the feature (lane) axis of an (R, E) tile; f32 stats,
    flax fast-variance. Returns (y, xhat, rstd)."""
    r32 = r.astype(jnp.float32)
    mean = jnp.mean(r32, axis=-1, keepdims=True)
    var = jnp.mean(r32 * r32, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (r32 - mean) * rstd
    y = xhat * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(r.dtype), xhat, rstd


def _ln_bwd_rows(dy, xhat, rstd, g):
    """Backward of _layernorm_rows w.r.t. its input; dy (R, E) f32."""
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)  # (1, E)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * g.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dr = rstd * (dxhat - m1 - xhat * m2)
    return dr, dg, db


def _ffn_fwd_kernel(att_ref, x_ref, wu_ref, bu_ref, g1_ref, b1_ref,
                    wf1_ref, bf1_ref, wf2_ref, bf2_ref, g2_ref, b2_ref,
                    out_ref, *, eps):
    cdt = x_ref.dtype
    a = (_dot(att_ref[...], wu_ref[...].astype(cdt)).astype(cdt)
         + bu_ref[...].astype(cdt))
    y1, _, _ = _layernorm_rows(a + x_ref[...], g1_ref[...], b1_ref[...], eps)
    h = jnp.maximum(
        _dot(y1, wf1_ref[...].astype(cdt)).astype(cdt)
        + bf1_ref[...].astype(cdt), 0)
    f = (_dot(h, wf2_ref[...].astype(cdt)).astype(cdt)
         + bf2_ref[...].astype(cdt))
    y2, _, _ = _layernorm_rows(f + y1, g2_ref[...], b2_ref[...], eps)
    out_ref[...] = y2


def _ffn_bwd_kernel(att_ref, x_ref, wu_ref, bu_ref, g1_ref, b1_ref,
                    wf1_ref, bf1_ref, wf2_ref, bf2_ref, g2_ref, b2_ref,
                    g_ref,
                    datt_ref, dx_ref, dwu_ref, dbu_ref, dg1_ref, db1_ref,
                    dwf1_ref, dbf1_ref, dwf2_ref, dbf2_ref, dg2_ref, db2_ref,
                    *, eps):
    cdt = x_ref.dtype
    att = att_ref[...]
    wu = wu_ref[...].astype(cdt)
    wf1 = wf1_ref[...].astype(cdt)
    wf2 = wf2_ref[...].astype(cdt)

    # ---- recompute the row-local forward ---------------------------------
    a = _dot(att, wu).astype(cdt) + bu_ref[...].astype(cdt)
    y1, xhat1, rstd1 = _layernorm_rows(a + x_ref[...], g1_ref[...],
                                       b1_ref[...], eps)
    pre_h = _dot(y1, wf1).astype(cdt) + bf1_ref[...].astype(cdt)
    h = jnp.maximum(pre_h, 0)
    f = _dot(h, wf2).astype(cdt) + bf2_ref[...].astype(cdt)
    _, xhat2, rstd2 = _layernorm_rows(f + y1, g2_ref[...], b2_ref[...], eps)

    # ---- backward ---------------------------------------------------------
    dy2 = g_ref[...].astype(jnp.float32)
    dr2, dg2, db2 = _ln_bwd_rows(dy2, xhat2, rstd2, g2_ref[...])
    df = dr2.astype(cdt)
    dbf2 = jnp.sum(dr2, axis=0, keepdims=True)
    dwf2 = _dot_tt(h, df)  # (F, E)
    dh = _dot(df, wf2.T)  # (R, F) f32
    # f32 compare: Mosaic on v5e rejects bf16 cmpf
    dh = jnp.where(pre_h.astype(jnp.float32) > 0.0, dh, 0.0)
    dhc = dh.astype(cdt)
    dbf1 = jnp.sum(dh, axis=0, keepdims=True)
    dwf1 = _dot_tt(y1, dhc)  # (E, F)
    dy1 = dr2 + _dot(dhc, wf1.T)

    dr1, dg1, db1 = _ln_bwd_rows(dy1, xhat1, rstd1, g1_ref[...])
    da = dr1.astype(cdt)
    dbu = jnp.sum(dr1, axis=0, keepdims=True)
    dwu = _dot_tt(att, da)  # (E, E)
    datt_ref[...] = _dot(da, wu.T).astype(datt_ref.dtype)
    dx_ref[...] = dr1.astype(dx_ref.dtype)

    updates = (
        (dwu_ref, dwu), (dbu_ref, dbu), (dg1_ref, dg1), (db1_ref, db1),
        (dwf1_ref, dwf1), (dbf1_ref, dbf1), (dwf2_ref, dwf2),
        (dbf2_ref, dbf2), (dg2_ref, dg2), (db2_ref, db2),
    )
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref, val in updates:
            ref[...] = val

    @pl.when(i != 0)
    def _():
        for ref, val in updates:
            ref[...] += val


def _row_pad(n: int, tile: int) -> int:
    return -(-n // tile) * tile


def _weight_specs(e: int, f: int):
    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return [
        full((e, e)), full((1, e)),  # wu bu
        full((1, e)), full((1, e)),  # g1 b1
        full((e, f)), full((1, f)),  # wf1 bf1
        full((f, e)), full((1, e)),  # wf2 bf2
        full((1, e)), full((1, e)),  # g2 b2
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def _ffn_block(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2, eps):
    return _ffn_fwd_impl(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2,
                         g2, b2, eps)


def _ffn_fwd_impl(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2, eps):
    n, e = x.shape
    f = wf1.shape[1]
    rspec = pl.BlockSpec((ROW_TILE, e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // ROW_TILE,),
        in_specs=[rspec, rspec] + _weight_specs(e, f),
        out_specs=rspec,
    )(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2)


def _ffn_fwd(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2, eps):
    out = _ffn_fwd_impl(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2,
                        g2, b2, eps)
    return out, (att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2)


def _ffn_bwd(eps, residuals, g):
    att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2 = residuals
    n, e = x.shape
    f = wf1.shape[1]
    rspec = pl.BlockSpec((ROW_TILE, e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def acc(shape):
        return (jax.ShapeDtypeStruct(shape, jnp.float32),
                pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                             memory_space=pltpu.VMEM))

    out_shapes, out_specs = zip(
        (jax.ShapeDtypeStruct(att.shape, att.dtype), rspec),  # datt
        (jax.ShapeDtypeStruct(x.shape, x.dtype), rspec),      # dx
        acc((e, e)), acc((1, e)),                             # dwu dbu
        acc((1, e)), acc((1, e)),                             # dg1 db1
        acc((e, f)), acc((1, f)),                             # dwf1 dbf1
        acc((f, e)), acc((1, e)),                             # dwf2 dbf2
        acc((1, e)), acc((1, e)),                             # dg2 db2
    )
    outs = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, eps=eps),
        out_shape=tuple(out_shapes),
        grid=(n // ROW_TILE,),
        in_specs=[rspec, rspec] + _weight_specs(e, f) + [rspec],
        out_specs=tuple(out_specs),
    )(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2, g)
    datt, dx, dwu, dbu, dg1, db1, dwf1, dbf1, dwf2, dbf2, dg2, db2 = outs

    def like(gval, ref):
        return gval.astype(ref.dtype)

    return (datt, dx, like(dwu, wu), like(dbu, bu), like(dg1, g1),
            like(db1, b1), like(dwf1, wf1), like(dbf1, bf1),
            like(dwf2, wf2), like(dbf2, bf2), like(dg2, g2), like(db2, b2))


_ffn_block.defvjp(_ffn_fwd, _ffn_bwd)


def fused_ffn_block(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2,
                    eps: float = 1e-6):
    """unify -> +x -> LN1 -> FF -> +res -> LN2 over flattened rows.

    att/x: (N, E) row-major flattened (B*T, E); biases/LN params as (1, E)/
    (1, F) rows; weights in flax orientation (in, out). Rows are padded to
    the tile size here and sliced back after.
    """
    n, e = x.shape
    n_pad = _row_pad(n, ROW_TILE)
    if n_pad != n:
        att = jnp.pad(att, ((0, n_pad - n), (0, 0)))
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    out = _ffn_block(att, x, wu, bu, g1, b1, wf1, bf1, wf2, bf2, g2, b2, eps)
    return out[:n]


def supports(e: int, heads: int, ff_hidden_mult: int = 4) -> bool:
    """The fused path needs flash-compatible heads (sublane-multiple head
    dim), a feature dim that at least half-fills the 128 lanes (below E=64
    the tile padding makes the kernel LOSE to XLA — measured on v5e), and
    row tiles within VMEM (the FF weight residency scales with the block's
    REAL hidden width ``ff_hidden_mult * e``, not an assumed 4x)."""
    if e % heads or (e // heads) % 8 or e < 64:
        return False
    f = ff_hidden_mult * e
    # row tile + weights comfortably under VMEM
    return (ROW_TILE * (2 * e + f) * 4 + 2 * e * f * 4) < 12 * 1024 * 1024


def fused_transformer_block(
    x: jax.Array,
    mask: Optional[jax.Array],
    params: dict,
    heads: int,
    eps: float = 1e-6,
    use_pallas_attention: Optional[bool] = None,
) -> jax.Array:
    """Full reference block: qkv projection (XLA) -> flash attention ->
    fused unify/LN/FF kernel. ``params`` uses flax orientations — see
    models/transformer.py for the exact key set."""
    from .attention import attention

    b, t, e = x.shape
    s = e // heads
    cdt = x.dtype

    q = _dot(x.reshape(b * t, e), params["toqueries"].astype(cdt)).astype(cdt)
    k = _dot(x.reshape(b * t, e), params["tokeys"].astype(cdt)).astype(cdt)
    v = _dot(x.reshape(b * t, e), params["tovalues"].astype(cdt)).astype(cdt)

    def to_heads(a):
        return a.reshape(b, t, heads, s).transpose(0, 2, 1, 3)

    att = attention(to_heads(q), to_heads(k), to_heads(v), mask, emb=e,
                    use_pallas=use_pallas_attention)
    att = att.transpose(0, 2, 1, 3).reshape(b * t, e)

    def row(p):
        return p.reshape(1, -1)

    out = fused_ffn_block(
        att, x.reshape(b * t, e),
        params["unifyheads_kernel"], row(params["unifyheads_bias"]),
        row(params["norm1_scale"]), row(params["norm1_bias"]),
        params["ff_in_kernel"], row(params["ff_in_bias"]),
        params["ff_out_kernel"], row(params["ff_out_bias"]),
        row(params["norm2_scale"]), row(params["norm2_bias"]),
        eps,
    )
    return out.reshape(b, t, e)
