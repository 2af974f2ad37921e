"""ConvMixer host-galaxy image encoder.

Re-expresses the reference's ConvMixer (src/models_multimodal.py:38-95) in
NHWC — the TPU-native conv layout that XLA tiles directly onto the MXU —
instead of the reference's NCHW. Structure: a stride=patch patch-embedding
conv, ``depth`` mixer blocks (residual depthwise conv -> pointwise conv, each
with exact-GELU + BatchNorm + dropout), then global average pooling and a
GELU MLP head to ``n_out``.

BatchNorm uses running statistics carried in the ``batch_stats`` collection;
pass ``axis_name`` under a data-parallel mesh so batch statistics are
synchronised across chips with a psum (a correctness detail the
single-device reference never needed).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.GELU default is the exact erf form; flax defaults to tanh approx.
_gelu = partial(nn.gelu, approximate=False)


class ConvMixer(nn.Module):
    dim: int = 32
    depth: int = 8
    channels: int = 3
    kernel_size: int = 5
    patch_size: int = 8
    n_out: int = 128
    dropout_prob: float = 0.5
    bn_momentum: float = 0.9  # = 1 - torch momentum (0.1)
    axis_name: Optional[str] = None  # cross-chip BN stat sync axis

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, H, W, C) NHWC image in [0, 1]; returns (B, n_out)."""
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
        )
        drop = partial(nn.Dropout, self.dropout_prob, deterministic=not train)

        # Patch embedding
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            name="patch_embed",
        )(x)
        x = _gelu(x)
        x = bn(name="patch_bn")(x)

        for i in range(self.depth):
            # Residual depthwise mixer
            h = nn.Conv(
                self.dim,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                feature_group_count=self.dim,
                name=f"dw_conv_{i}",
            )(x)
            h = _gelu(h)
            h = bn(name=f"dw_bn_{i}")(h)
            h = drop()(h)
            x = x + h
            # Pointwise channel mixer
            x = nn.Conv(self.dim, (1, 1), name=f"pw_conv_{i}")(x)
            x = _gelu(x)
            x = bn(name=f"pw_bn_{i}")(x)
            x = drop()(x)

        # Head: global average pool -> Dense(1024) -> GELU -> Dense(n_out)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(1024, name="head_fc1")(x)
        x = _gelu(x)
        x = drop()(x)
        return nn.Dense(self.n_out, name="head_fc2")(x)
