"""ViT host-galaxy image encoder — a TPU-first ALTERNATIVE to ConvMixer.

No reference counterpart (the reference's only image tower is ConvMixer,
src/models_multimodal.py:38-95); this is a framework extension chosen for
how it maps to TPU hardware:

  * patchify = one reshape + one Dense: a single large MXU matmul, vs the
    ConvMixer stack of depthwise 5x5 convolutions that lower to VPU-bound
    ops with low arithmetic intensity;
  * LayerNorm instead of BatchNorm: no running batch statistics, so there
    is no cross-chip stat sync (psum) under data parallelism and no
    train/eval divergence to manage in the sharded trainer;
  * pre-norm residual blocks with GELU MLPs — the standard ViT block, all
    matmul-dominated, reusing the same fused attention dispatch
    (ops/attention.py -> Pallas flash kernel when supported).

Select it with ``CLIPConfig(image_encoder="vit", vit_kwargs=...)``; the
default remains ConvMixer for reference-checkpoint compatibility
(models/factory.py imports only ConvMixer towers).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention

_gelu = partial(nn.gelu, approximate=False)


class _ViTBlock(nn.Module):
    """Pre-norm transformer block: x + MHSA(LN(x)); x + MLP(LN(x))."""

    emb: int
    heads: int
    mlp_mult: int = 4
    dropout_prob: float = 0.0
    use_pallas: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, t, e = x.shape
        s = e // self.heads
        drop = partial(nn.Dropout, self.dropout_prob, deterministic=not train)

        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(e, use_bias=False, dtype=self.dtype, name="toqueries")(h)
        k = nn.Dense(e, use_bias=False, dtype=self.dtype, name="tokeys")(h)
        v = nn.Dense(e, use_bias=False, dtype=self.dtype, name="tovalues")(h)

        def to_heads(a):
            return a.reshape(b, t, self.heads, s).transpose(0, 2, 1, 3)

        # Standard ViT scaling is 1/sqrt(head_dim): the shared attention core
        # scales q and k by emb**-0.25 each, so passing emb=head_dim yields
        # exactly that (this tower has no reference semantics to pin).
        out = attention(
            to_heads(q), to_heads(k), to_heads(v), None,
            emb=s, use_pallas=self.use_pallas,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, e)
        out = nn.Dense(e, dtype=self.dtype, name="unifyheads")(out)
        x = x + drop()(out)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_mult * e, dtype=self.dtype, name="mlp_in")(h)
        h = _gelu(h)
        h = nn.Dense(e, dtype=self.dtype, name="mlp_out")(h)
        return x + drop()(h)


class ViT(nn.Module):
    """Patch-embedding vision transformer over NHWC images in [0, 1].

    The image side length must be divisible by ``patch_size``; ``emb`` must
    be divisible by ``heads``. Returns (B, n_out) pooled features, same
    contract as ConvMixer (models/convmixer.py), so it drops into
    ``CLIPModel.image_encoder`` unchanged.
    """

    emb: int = 128
    depth: int = 6
    heads: int = 4
    patch_size: int = 10
    mlp_mult: int = 4
    n_out: int = 128
    dropout_prob: float = 0.0
    use_pallas: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, hh, ww, c = x.shape
        p = self.patch_size
        assert hh % p == 0 and ww % p == 0, (
            f"image {hh}x{ww} not divisible by patch_size {p}"
        )
        gh, gw = hh // p, ww // p
        n = gh * gw

        # Patchify: (B,H,W,C) -> (B, N, p*p*C) -> Dense = ONE MXU matmul.
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, p * p * c)
        h = nn.Dense(self.emb, dtype=self.dtype, name="patch_embed")(x)

        pos = self.param(
            "pos_emb",
            nn.initializers.normal(stddev=0.02),
            (1, n, self.emb),
        )
        h = h + pos.astype(h.dtype)
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)

        for i in range(self.depth):
            h = _ViTBlock(
                self.emb,
                self.heads,
                self.mlp_mult,
                self.dropout_prob,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, train=train)

        h = nn.LayerNorm(name="norm_out")(h.astype(jnp.float32))
        h = h.mean(axis=1)  # mean-pool tokens (no CLS: fixed shapes, simpler)
        return nn.Dense(self.n_out, name="head")(h)
