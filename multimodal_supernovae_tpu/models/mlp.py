"""Plain MLP (Linear-ReLU-Dropout stack), matching the reference MLP
(src/models_multimodal.py:834-856): ``num_layers`` hidden layers of
``hidden_dim`` and a linear output head."""

from __future__ import annotations

import jax
from flax import linen as nn


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, name=f"hidden_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="out")(x)
