"""MLP fine-tune head over frozen (or trainable) CLIP embeddings.

TPU rebuild of ``ClipMLP`` (src/models_multimodal.py:859-1116): normalized
lightcurve and/or spectral CLIP embeddings are concatenated and fed to an MLP
for redshift regression or SN-type classification. Freezing the CLIP
backbone is handled OUTSIDE the module by an optax gradient mask
(training/optim.py) — the functional equivalent of the reference's
``requires_grad = False`` surgery — so the module itself stays mode-free.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import Batch
from ..data.transforms import CLASS_WEIGHTS
from ..ops import losses as L
from .clip import CLIPConfig, CLIPModel
from .mlp import MLP


@dataclasses.dataclass(frozen=True)
class ClipMLPConfig:
    clip: CLIPConfig
    combinations: Tuple[str, ...] = ("lightcurve",)
    hidden_dim: int = 32
    num_layers: int = 2
    dropout: float = 0.0
    regression: bool = True
    classification: bool = False
    n_classes: int = 5

    @property
    def head_out(self) -> int:
        return self.n_classes if self.classification else 1

    @property
    def supervised(self) -> bool:
        return self.regression or self.classification


class ClipMLPHead(nn.Module):
    cfg: ClipMLPConfig

    def setup(self):
        self.clip_model = CLIPModel(self.cfg.clip)
        self.mlp_model = MLP(
            hidden_dim=self.cfg.hidden_dim,
            output_dim=self.cfg.head_out,
            num_layers=self.cfg.num_layers,
            dropout=self.cfg.dropout,
        )

    def __call__(self, batch: Batch, train: bool = False) -> jax.Array:
        embs = []
        if "lightcurve" in self.cfg.combinations:
            embs.append(
                self.clip_model.embed_lightcurve(
                    batch.x_lc, batch.t_lc, batch.mask_lc, train=train
                )
            )
        if "spectral" in self.cfg.combinations:
            embs.append(
                self.clip_model.embed_spectral(
                    batch.x_sp, batch.t_sp, batch.mask_sp, train=train
                )
            )
        return self.mlp_model(jnp.concatenate(embs, axis=-1), train=train)

    def loss_fn(
        self,
        batch: Batch,
        train: bool = False,
        key: Optional[jax.Array] = None,
        gather_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        out = self(batch, train=train)
        if self.cfg.regression:
            pred = out[:, 0]
            return L.mse_loss(pred, batch.redshift), {"pred": pred}
        weights = (
            jnp.asarray(CLASS_WEIGHTS[self.cfg.n_classes])
            if self.cfg.n_classes in CLASS_WEIGHTS
            else None
        )
        return L.weighted_cross_entropy(out, batch.label, weights), {"logits": out}
