"""Sequence encoders: transformer with continuous time/wavelength positional
encoding, band embeddings, and masked aggregation.

Architecture semantics match the reference's ``TransformerWithTimeEmbeddings``
stack (src/transformer_utils.py) — post-norm blocks, e**-1/4 q/k scaling,
-1e7 key-mask fill, band-blocked band embeddings, masked mean / max /
attention-pooled / full-sequence aggregation — re-expressed as flax.linen
modules over fused XLA/Pallas attention cores (ops/attention.py).

Parameter names deliberately mirror the reference state_dict keys
(tokeys/toqueries/tovalues/unifyheads, norm1/norm2, embedding_mag, band_emb,
projection, ...) so reference checkpoints can be imported by a mechanical
name/transpose mapping (models/factory.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..ops import fused_block as _fused


def time_positional_encoding(t: jax.Array, d_emb: int, norm: float) -> jax.Array:
    """Sinusoidal encoding of continuous observation times/wavelengths.

    Unlike token-index positional encodings, the argument is the physical
    time (or wavelength) value itself; ``norm`` is the tunable wavelength
    base (the ``time_norm`` hyperparameter). Matches
    ``TimePositionalEncoding`` (src/transformer_utils.py:156-176):
    even channels sin, odd channels cos, shared frequency per pair.

    Args: t (B, T); returns (B, T, d_emb).
    """
    half = d_emb // 2
    div = jnp.exp(
        jnp.arange(0, d_emb, 2, dtype=jnp.float32) * (-math.log(norm) / d_emb)
    )  # (half,)
    arg = t[..., None] * div  # (B, T, half)
    pe = jnp.stack([jnp.sin(arg), jnp.cos(arg)], axis=-1)  # (B, T, half, 2)
    return pe.reshape(*t.shape, 2 * half)


class SelfAttention(nn.Module):
    """Multi-head self-attention: separate bias-free K/Q/V projections, the
    reference's full-emb e**-1/4 scaling, additive-mask softmax, and a biased
    head-unification projection (src/transformer_utils.py:8-89).

    On TPU the whole module can run as ONE Pallas kernel with the
    projections + head fold + unify inside (ops/qkv_attention.py), which
    kills the custom-call boundary relayouts around the flash kernel.
    Opt-in via ``MMSN_FUSED_QKV=1`` — measured and REJECTED as default in
    round 4 (benchmarks/PERF.md: the whole-sequence per-sample score
    buffer caps samples-per-program at 1 on the LC tower, re-entering the
    grid-overhead regime; 25.2 vs 15.7 ms/step @B=256). The param tree is
    identical either way."""

    emb: int
    heads: int = 2
    use_pallas: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        import os

        from ..ops import qkv_attention as _qkv

        b, t, e = x.shape
        assert e == self.emb, f"input dim {e} != layer emb {self.emb}"
        assert e % self.heads == 0
        s = e // self.heads

        env = os.environ.get("MMSN_FUSED_QKV")
        use_fused = env == "1" and (
            jax.default_backend() == "tpu" and _qkv.supports(t, e, self.heads)
        )
        if use_fused:
            wk, _ = _DenseParams(e, e, False, name="tokeys")()
            wq, _ = _DenseParams(e, e, False, name="toqueries")()
            wv, _ = _DenseParams(e, e, False, name="tovalues")()
            wu, bu = _DenseParams(e, e, True, name="unifyheads")()
            cdt = self.dtype or x.dtype
            return _qkv.fused_qkv_attention(
                x.astype(cdt), mask, wq, wk, wv, wu, bu,
                heads=self.heads, emb=e,
            )

        keys = nn.Dense(e, use_bias=False, dtype=self.dtype, name="tokeys")(x)
        queries = nn.Dense(e, use_bias=False, dtype=self.dtype, name="toqueries")(x)
        values = nn.Dense(e, use_bias=False, dtype=self.dtype, name="tovalues")(x)

        def to_heads(a):
            return a.reshape(b, t, self.heads, s).transpose(0, 2, 1, 3)

        out = attention(
            to_heads(queries),
            to_heads(keys),
            to_heads(values),
            mask,
            emb=e,
            use_pallas=self.use_pallas,
        )  # (B, H, T, S)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, e)
        return nn.Dense(e, dtype=self.dtype, name="unifyheads")(out)


class _DenseParams(nn.Module):
    """Parameter shell: declares exactly the params an ``nn.Dense`` would
    (same names, shapes, initializers) without applying it — the fused block
    kernel consumes the raw arrays. Keeps the param tree identical whether a
    block runs fused or unfused, so checkpoints/imports are interchangeable."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        if not self.use_bias:
            return kernel, None
        return kernel, self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )


class _LNParams(nn.Module):
    """Parameter shell mirroring ``nn.LayerNorm``'s scale/bias."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.features,)),
            self.param("bias", nn.initializers.zeros_init(), (self.features,)),
        )


class _AttnParams(nn.Module):
    """Parameter shell mirroring ``SelfAttention``'s submodule tree."""

    emb: int

    @nn.compact
    def __call__(self):
        wk, _ = _DenseParams(self.emb, self.emb, False, name="tokeys")()
        wq, _ = _DenseParams(self.emb, self.emb, False, name="toqueries")()
        wv, _ = _DenseParams(self.emb, self.emb, False, name="tovalues")()
        wu, bu = _DenseParams(self.emb, self.emb, True, name="unifyheads")()
        return wq, wk, wv, wu, bu


class TransformerBlock(nn.Module):
    """Post-norm block: ``norm1(attn(x) + x)`` -> dropout ->
    ``norm2(ff(x) + x)`` -> dropout, with a ReLU MLP of width
    ``ff_hidden_mult * emb`` (src/transformer_utils.py:92-116).

    On TPU with inactive dropout the whole block can run as ONE fused Pallas
    kernel (ops/fused_block.py) — same math, same params, ~15x less HBM
    traffic. The fused path has its own opt-in (``use_fused_block`` /
    ``MMSN_FUSED_BLOCK=1``); ``use_pallas`` only selects the ATTENTION
    dispatch (flash kernel vs dense XLA), so benchmarks that force
    ``use_pallas=True`` measure flash attention, not the fused block.
    """

    emb: int
    heads: int
    ff_hidden_mult: int = 4
    dropout: float = 0.0
    use_pallas: Optional[bool] = None
    use_fused_block: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        import os

        # The fused block kernel is OPT-IN (MMSN_FUSED_BLOCK=1 or explicit
        # use_fused_block=True): measured on v5e at the reference's shapes it
        # LOSES ~4 ms/step to the XLA lowering (benchmarks r2, README perf
        # notes) — the model is too small for the kernel's per-program
        # overhead to amortise. Kept, tested and documented for larger
        # encoder configs where the traffic saving wins.
        env = os.environ.get("MMSN_FUSED_BLOCK")
        use_fused = self.use_fused_block
        if env == "0":
            # Kill switch: wins even over an explicit use_fused_block=True
            # (lets an operator disable the kernel on a config they cannot
            # edit).
            use_fused = False
        elif use_fused is None:
            # The env opt-in is a TPU perf knob: never route a CPU/GPU run
            # into the TPU-only (pltpu.VMEM) kernel because a bench shell
            # exported the flag. Explicit use_fused_block=True still runs
            # anywhere (tests drive it under force_tpu_interpret_mode).
            use_fused = env == "1" and jax.default_backend() == "tpu"
        if (
            use_fused
            and self.dropout == 0.0
            and _fused.supports(self.emb, self.heads, self.ff_hidden_mult)
        ):
            wq, wk, wv, wu, bu = _AttnParams(self.emb, name="attention")()
            g1, b1 = _LNParams(self.emb, name="norm1")()
            f = self.ff_hidden_mult * self.emb
            wf1, bf1 = _DenseParams(self.emb, f, name="ff_in")()
            wf2, bf2 = _DenseParams(f, self.emb, name="ff_out")()
            g2, b2 = _LNParams(self.emb, name="norm2")()
            return _fused.fused_transformer_block(
                x, mask,
                {
                    "toqueries": wq, "tokeys": wk, "tovalues": wv,
                    "unifyheads_kernel": wu, "unifyheads_bias": bu,
                    "norm1_scale": g1, "norm1_bias": b1,
                    "ff_in_kernel": wf1, "ff_in_bias": bf1,
                    "ff_out_kernel": wf2, "ff_out_bias": bf2,
                    "norm2_scale": g2, "norm2_bias": b2,
                },
                self.heads,
                use_pallas_attention=self.use_pallas,
            )

        attended = SelfAttention(
            self.emb, self.heads, use_pallas=self.use_pallas, dtype=self.dtype,
            name="attention",
        )(x, mask)
        # LayerNorms accumulate in f32 regardless of compute dtype.
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(attended + x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        h = nn.Dense(self.ff_hidden_mult * self.emb, dtype=self.dtype, name="ff_in")(x)
        h = nn.relu(h)
        h = nn.Dense(self.emb, dtype=self.dtype, name="ff_out")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(h + x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Transformer(nn.Module):
    """Input dropout + a stack of post-norm blocks
    (src/transformer_utils.py:119-153).

    ``remat`` checkpoints each block: the backward pass recomputes the
    block's ~10 intermediates from its (much smaller) input instead of
    fetching them from HBM. OPT-IN (default off): at the reference's sizes
    the step is attention-compute-bound, not residual-traffic-bound, and
    remat measured 5 ms/step SLOWER on v5e (benchmarks r2) — it pays off
    only for models whose activations pressure HBM.
    """

    emb: int
    heads: int
    depth: int
    ff_hidden_mult: int = 4
    dropout: float = 0.0
    use_pallas: Optional[bool] = None
    use_fused_block: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None
    remat: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        import os

        remat = self.remat
        if remat is None:
            remat = os.environ.get("MMSN_REMAT") == "1"
        block_cls = (
            nn.remat(TransformerBlock, static_argnums=(3,))
            if remat else TransformerBlock
        )

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.depth):
            x = block_cls(
                self.emb,
                self.heads,
                self.ff_hidden_mult,
                self.dropout,
                use_pallas=self.use_pallas,
                use_fused_block=self.use_fused_block,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, mask, train)
        return x


class TorchStyleMHA(nn.Module):
    """Attention-pooling MHA with torch ``nn.MultiheadAttention`` semantics:
    packed in-projection with bias, per-head 1/sqrt(head_dim) scaling, biased
    out-projection. Used only by the ``agg='attn'`` pooling head
    (src/transformer_utils.py:204-207, :241-247), which attends a learned
    query over the (already pad-zeroed, unmasked) sequence."""

    emb: int
    heads: int = 2

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        e, h = self.emb, self.heads
        s = e // h
        qp = nn.Dense(e, name="q_proj")(q)
        kp = nn.Dense(e, name="k_proj")(k)
        vp = nn.Dense(e, name="v_proj")(v)

        def to_heads(a):
            return a.reshape(a.shape[0], a.shape[1], h, s).transpose(0, 2, 1, 3)

        qh, kh, vh = to_heads(qp), to_heads(kp), to_heads(vp)
        scores = jnp.einsum("bhts,bhus->bhtu", qh, kh) / math.sqrt(s)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhtu,bhus->bhts", w, vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], e)
        return nn.Dense(e, name="out_proj")(out)


class SequenceEncoder(nn.Module):
    """Transformer encoder over (value, time) sequences — the TPU rebuild of
    ``TransformerWithTimeEmbeddings`` (src/transformer_utils.py:179-253).

    Pipeline: ``Dense(1->emb)(value) + time_PE(t) [+ band embedding]`` ->
    transformer -> zero padded positions -> aggregate -> ``Dense(emb->n_out)``.

    ``nband > 1`` expects the band-blocked layout (band b occupies sequence
    positions [b*T/nband, (b+1)*T/nband)) and adds a learned per-band
    embedding. Aggregations: 'mean' (mask-weighted), 'max' (over the
    pad-zeroed sequence), 'attn' (learned query + TorchStyleMHA), and
    'pretraining' (returns the full pad-zeroed sequence, no projection).
    """

    n_out: int
    emb: int
    heads: int = 2
    depth: int = 8
    ff_hidden_mult: int = 4
    dropout: float = 0.0
    nband: int = 1
    agg: str = "mean"
    time_norm: float = 10000.0
    use_pallas: Optional[bool] = None
    use_fused_block: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        if x.ndim == 2:
            x = x[..., None]  # add the value-channel dim
        h = nn.Dense(self.emb, dtype=self.dtype, name="embedding_mag")(x)
        h = h + time_positional_encoding(t, self.emb, self.time_norm).astype(h.dtype)

        if self.nband > 1:
            seq_len = h.shape[1]
            band_ids = jnp.repeat(
                jnp.arange(self.nband), seq_len // self.nband
            )  # band-blocked layout (src/transformer_utils.py:219-231)
            b_emb = nn.Embed(self.nband, self.emb, name="band_emb")(band_ids)
            h = h + b_emb[None, :, :]

        h = Transformer(
            self.emb,
            self.heads,
            self.depth,
            self.ff_hidden_mult,
            self.dropout,
            use_pallas=self.use_pallas,
            use_fused_block=self.use_fused_block,
            dtype=self.dtype,
            name="transformer",
        )(h, mask, train)

        if mask is not None:
            h = h * mask[:, :, None].astype(h.dtype)

        if self.agg == "mean":
            if mask is None:
                h = h.mean(axis=1)
            else:
                h = h.sum(axis=1) / mask.sum(axis=1).astype(h.dtype)[:, None]
        elif self.agg == "max":
            h = h.max(axis=1)
        elif self.agg == "attn":
            query = self.param(
                "query", nn.initializers.uniform(scale=1.0), (self.emb,)
            )  # torch.rand init (src/transformer_utils.py:204)
            q = jnp.broadcast_to(query[None, None, :], (h.shape[0], 1, self.emb))
            h = TorchStyleMHA(self.emb, heads=2, name="agg_attn")(q, h, h)[:, 0, :]
        elif self.agg == "pretraining":
            return h
        else:
            raise ValueError(f"unknown agg: {self.agg}")

        # final projection in f32: the embedding feeds L2 normalisation and
        # the contrastive logit matrix, which want full precision.
        return nn.Dense(self.n_out, name="projection")(h.astype(jnp.float32))
