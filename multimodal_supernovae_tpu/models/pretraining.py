"""Masked light-curve pretraining (MAE-style).

TPU rebuild of ``MaskedLightCurveEncoder`` (src/models_pretraining.py:101-259):
a ``SequenceEncoder`` in ``agg='pretraining'`` mode (returns the full
pad-zeroed sequence) plus a linear head back to one value per position. A
random contiguous span per band is hidden from the input (values zeroed) and
the MSE is taken over exactly the hidden positions.

The reference's per-sample Python masking loops
(``get_continous_random_mask``/``get_random_mask``) are replaced by the
vectorized, jitted mask builders in data/augment.py; the whole
mask->forward->masked-MSE pipeline is one fused XLA program.

Note: the reference README references a ``retraining_wandb.py`` entry point
for this model that does not exist in the snapshot (SURVEY.md §2.3); this
framework provides it as a first-class trainer (scripts/pretrain_masked.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.augment import contiguous_span_mask, random_subset_mask
from .transformer import SequenceEncoder


@dataclasses.dataclass(frozen=True)
class MaskedEncoderConfig:
    f_mask: float = 0.2
    nband: int = 1
    contiguous: bool = True  # contiguous-span (reference default) vs subset
    transformer_kwargs: Tuple[Tuple[str, Any], ...] = (
        ("n_out", 1),
        ("emb", 128),
        ("heads", 2),
        ("depth", 4),
    )

    @classmethod
    def create(cls, transformer_kwargs: Optional[Dict[str, Any]] = None, **kw):
        merged = {"n_out": 1, "emb": 128, "heads": 2, "depth": 4}
        merged.update(transformer_kwargs or {})
        return cls(transformer_kwargs=tuple(sorted(merged.items())), **kw)

    def tk(self) -> Dict[str, Any]:
        return dict(self.transformer_kwargs)


class MaskedLightCurveEncoder(nn.Module):
    cfg: MaskedEncoderConfig

    def setup(self):
        tk = self.cfg.tk()
        self.net = SequenceEncoder(nband=self.cfg.nband, agg="pretraining", **tk)
        self.last_layer = nn.Dense(1)
        self._emb = tk["emb"]

    def __call__(self, batch, train: bool = False) -> jax.Array:
        """Uniform batch interface: reconstruct the light-curve sequence."""
        return self.predict(batch.x_lc, batch.t_lc, batch.mask_lc, train=train)

    def predict(self, x, t, mask=None, train: bool = False) -> jax.Array:
        """Predict a value per sequence position: (B, T) -> (B, T)."""
        h = self.net(x, t, mask, train=train)  # (B, T, emb)
        return self.last_layer(h)[..., 0]

    def masked_pred(
        self, x, t, padding_mask, key: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Hide a random span, reconstruct, return (truth, pred, pred_mask).

        Matches ``masked_pred`` (src/models_pretraining.py:191-212): the
        masked input positions are zeroed but the transformer still attends
        over the full padding mask; the loss covers only hidden positions.
        Returns full (B, T) arrays plus the boolean mask selecting the hidden
        positions — fixed shapes, unlike the reference's ragged fancy-index.
        """
        mask_fn = contiguous_span_mask if self.cfg.contiguous else (
            lambda pm, nb, f, k: random_subset_mask(pm, f, k)
        )
        mask_keep, mask_pred = mask_fn(
            padding_mask, self.cfg.nband, self.cfg.f_mask, key
        )
        x_masked = jnp.where(mask_keep, x, 0.0)
        x_pred = self.predict(x_masked, t, mask=padding_mask, train=train)
        return x, x_pred, mask_pred

    def loss_fn(
        self,
        batch,
        train: bool = False,
        key: Optional[jax.Array] = None,
        gather_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """MSE over the hidden positions only
        (src/models_pretraining.py:225-235). Uniform trainable-module loss
        interface: consumes the light-curve fields of the canonical batch
        (the reference's 3-tuple and 9-tuple cases both reduce to these,
        models_pretraining.py:225-235)."""
        if key is None:
            raise ValueError("masked pretraining loss requires a PRNG key")
        truth, pred, mask_pred = self.masked_pred(
            batch.x_lc, batch.t_lc, batch.mask_lc, key, train
        )
        m = mask_pred.astype(pred.dtype)
        se = (truth - pred) ** 2 * m
        loss = se.sum() / jnp.maximum(m.sum(), 1.0)
        return loss, {"pred": pred, "mask_pred": mask_pred}
