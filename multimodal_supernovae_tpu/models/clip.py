"""The multimodal CLIP model — the framework's central class.

The TPU rebuild of ``LightCurveImageCLIP`` (src/models_multimodal.py:98-556):
per enabled modality an encoder plus a linear projection to the shared
``enc_dim`` space, a learnable log logit-scale and logit-bias, and three
operating modes:

  * contrastive (default): returns the list of L2-normalized per-modality
    embeddings in the canonical order (host_galaxy, lightcurve, spectral,
    meta) and trains with the pairwise CLIP-softmax or SigLIP loss;
  * regression: concatenates the (unnormalized) projected embeddings and
    maps them to a scalar redshift with one linear layer;
  * classification: same concatenation, mapped to ``n_classes`` logits and
    trained with the reference's hard-coded ZTF-BTS class weights.

Unlike the Lightning original, this module is pure: parameters/batch-stats
live in flax collections, randomness is explicit, and ``loss_fn`` is a pure
function suitable for ``jax.value_and_grad`` inside a single jitted train
step — with an optional mesh ``axis_name`` under which contrastive negatives
are all-gathered across chips (ops/losses.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import Batch
from ..data.transforms import CLASS_WEIGHTS
from ..ops import losses as L
from .convmixer import ConvMixer
from .mlp import MLP
from .transformer import SequenceEncoder
from .vit import ViT


def _default_seq_kwargs() -> Dict[str, Any]:
    return {"n_out": 128, "emb": 256, "heads": 2, "depth": 8, "time_norm": 10000.0}


def _default_conv_kwargs() -> Dict[str, Any]:
    return {
        "dim": 32,
        "depth": 8,
        "channels": 3,
        "kernel_size": 5,
        "patch_size": 10,
        "n_out": 128,
    }


def _default_meta_kwargs() -> Dict[str, Any]:
    return {"input_dim": 128, "hidden_dim": 128, "num_layers": 2}


def _default_vit_kwargs() -> Dict[str, Any]:
    return {
        "emb": 128,
        "depth": 6,
        "heads": 4,
        "patch_size": 10,
        "mlp_mult": 4,
        "n_out": 128,
    }


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Static model configuration (hashable; safe as a jit-static leaf)."""

    combinations: Tuple[str, ...] = ("host_galaxy", "spectral")
    enc_dim: int = 128
    logit_scale_init: float = 10.0
    logit_bias_init: float = -10.0
    nband: int = 1
    transformer_kwargs: Tuple[Tuple[str, Any], ...] = ()
    transformer_spectral_kwargs: Tuple[Tuple[str, Any], ...] = ()
    conv_kwargs: Tuple[Tuple[str, Any], ...] = ()
    meta_kwargs: Tuple[Tuple[str, Any], ...] = ()
    # Image tower family: 'convmixer' (reference parity, the default) or
    # 'vit' (TPU-first extension, models/vit.py — matmul-dominated, no
    # BatchNorm state to sync across chips).
    image_encoder: str = "convmixer"
    vit_kwargs: Tuple[Tuple[str, Any], ...] = ()
    loss: str = "sigmoid"  # 'sigmoid' | 'softmax'
    regression: bool = False
    classification: bool = False
    n_classes: int = 5
    use_pallas: Optional[bool] = None
    # 'bfloat16' runs encoder matmuls in bf16 on the MXU (params, layernorm
    # accumulation, final projections and the loss stay f32). None = f32.
    compute_dtype: Optional[str] = None

    @classmethod
    def create(
        cls,
        combinations: Sequence[str] = ("host_galaxy", "spectral"),
        transformer_kwargs: Optional[Dict[str, Any]] = None,
        transformer_spectral_kwargs: Optional[Dict[str, Any]] = None,
        conv_kwargs: Optional[Dict[str, Any]] = None,
        meta_kwargs: Optional[Dict[str, Any]] = None,
        vit_kwargs: Optional[Dict[str, Any]] = None,
        **kw,
    ) -> "CLIPConfig":
        def freeze(d, default):
            merged = dict(default)
            merged.update(d or {})
            return tuple(sorted(merged.items()))

        # Canonical modality order regardless of input order, matching the
        # reference's set-membership checks (models_multimodal.py:229-254).
        order = ("host_galaxy", "lightcurve", "spectral", "meta")
        combos = tuple(m for m in order if m in set(combinations))
        return cls(
            combinations=combos,
            transformer_kwargs=freeze(transformer_kwargs, _default_seq_kwargs()),
            transformer_spectral_kwargs=freeze(
                transformer_spectral_kwargs, _default_seq_kwargs()
            ),
            conv_kwargs=freeze(conv_kwargs, _default_conv_kwargs()),
            meta_kwargs=freeze(meta_kwargs, _default_meta_kwargs()),
            vit_kwargs=freeze(vit_kwargs, _default_vit_kwargs()),
            **kw,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    def tk(self) -> Dict[str, Any]:
        return dict(self.transformer_kwargs)

    def tsk(self) -> Dict[str, Any]:
        return dict(self.transformer_spectral_kwargs)

    def ck(self) -> Dict[str, Any]:
        return dict(self.conv_kwargs)

    def mk(self) -> Dict[str, Any]:
        return dict(self.meta_kwargs)

    def vk(self) -> Dict[str, Any]:
        return dict(self.vit_kwargs)

    @property
    def head_out(self) -> int:
        return self.n_classes if self.classification else 1

    @property
    def supervised(self) -> bool:
        return self.regression or self.classification


def _l2_normalize(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class CLIPModel(nn.Module):
    cfg: CLIPConfig
    axis_name: Optional[str] = None  # mesh axis for BN stat sync (images)

    def setup(self):
        c = self.cfg
        combos = set(c.combinations)
        # Learnable log-scale and bias (models_multimodal.py:164-167).
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(math.log(c.logit_scale_init), jnp.float32),
        )
        self.logit_bias = self.param(
            "logit_bias", lambda key: jnp.asarray(c.logit_bias_init, jnp.float32)
        )

        if "lightcurve" in combos:
            tk = c.tk()
            self.lightcurve_encoder = SequenceEncoder(
                nband=c.nband, use_pallas=c.use_pallas, dtype=c.dtype, **tk
            )
            self.lightcurve_projection = nn.Dense(c.enc_dim)
        if "spectral" in combos:
            tsk = c.tsk()
            self.spectral_encoder = SequenceEncoder(
                nband=1, use_pallas=c.use_pallas, dtype=c.dtype, **tsk
            )
            self.spectral_projection = nn.Dense(c.enc_dim)
        if "host_galaxy" in combos:
            if c.image_encoder == "vit":
                vk = c.vk()
                # The tower's token count ((H/p)*(W/p), e.g. 36 at 60x60/p10)
                # is far below the flash kernel's payoff range, so a
                # model-wide use_pallas=True does NOT force the kernel here —
                # the tower auto-dispatches per shape. An explicit
                # use_pallas=False kill-switch DOES propagate (it exists to
                # dodge kernel compile issues, so it must cover every tower),
                # and vit_kwargs["use_pallas"] (extra_args.vit_use_pallas)
                # overrides both.
                vk.setdefault(
                    "use_pallas", False if c.use_pallas is False else None
                )
                self.image_encoder = ViT(dtype=c.dtype, **vk)
            elif c.image_encoder == "convmixer":
                ck = c.ck()
                ck.pop("channels", None)  # NHWC input carries its own channels
                self.image_encoder = ConvMixer(axis_name=self.axis_name, **ck)
            else:
                raise ValueError(
                    f"unknown image_encoder {c.image_encoder!r}: "
                    "expected 'convmixer' or 'vit'"
                )
            self.image_projection = nn.Dense(c.enc_dim)
        if "meta" in combos:
            mk = c.mk()
            self.len_meta_input = mk["input_dim"]
            self.class_emb = nn.Embed(c.n_classes, self.len_meta_input // 2)
            self.meta_encoder = MLP(
                hidden_dim=mk["hidden_dim"],
                output_dim=c.enc_dim,
                num_layers=mk["num_layers"],
                dropout=mk.get("dropout", 0.0),
            )

        if c.supervised:
            self.linear = nn.Dense(c.head_out)

    # -- per-modality embeddings (projection included) ---------------------

    def embed_image(self, x_img, train: bool = False, normalize: bool = True):
        h = self.image_projection(self.image_encoder(x_img, train=train))
        return _l2_normalize(h) if normalize else h

    def embed_lightcurve(self, x, t, mask, train: bool = False, normalize=True):
        h = self.lightcurve_projection(
            self.lightcurve_encoder(x, t, mask, train=train)
        )
        return _l2_normalize(h) if normalize else h

    def embed_spectral(self, x, t, mask, train: bool = False, normalize=True):
        h = self.spectral_projection(self.spectral_encoder(x, t, mask, train=train))
        return _l2_normalize(h) if normalize else h

    def embed_meta(self, label, redshift, train: bool = False, normalize=True):
        # Half class embedding, half repeated redshift
        # (models_multimodal.py:244-254).
        ce = self.class_emb(label.astype(jnp.int32))
        rz = jnp.repeat(redshift[:, None], self.len_meta_input // 2, axis=1)
        h = self.meta_encoder(
            jnp.concatenate([ce, rz.astype(ce.dtype)], axis=-1), train=train
        )
        return _l2_normalize(h) if normalize else h

    # -- forward ------------------------------------------------------------

    def encode(
        self, batch: Batch, train: bool = False, normalize: bool = True
    ) -> List[jax.Array]:
        """Per-modality projected embeddings in canonical order."""
        c = self.cfg
        out = []
        if "host_galaxy" in c.combinations:
            out.append(self.embed_image(batch.x_img, train, normalize))
        if "lightcurve" in c.combinations:
            out.append(
                self.embed_lightcurve(
                    batch.x_lc, batch.t_lc, batch.mask_lc, train, normalize
                )
            )
        if "spectral" in c.combinations:
            out.append(
                self.embed_spectral(
                    batch.x_sp, batch.t_sp, batch.mask_sp, train, normalize
                )
            )
        if "meta" in c.combinations:
            out.append(self.embed_meta(batch.label, batch.redshift, train, normalize))
        return out

    def __call__(self, batch: Batch, train: bool = False):
        """Contrastive mode: list of normalized embeddings. Supervised mode:
        (B, head_out) predictions from concatenated unnormalized embeddings
        (models_multimodal.py:228-273)."""
        if self.cfg.supervised:
            embs = self.encode(batch, train=train, normalize=False)
            return self.linear(jnp.concatenate(embs, axis=-1))
        return self.encode(batch, train=train, normalize=True)

    def loss_fn(
        self,
        batch: Batch,
        train: bool = False,
        key: Optional[jax.Array] = None,
        gather_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Total training loss + auxiliary outputs.

        ``key`` is part of the uniform trainable-module loss interface
        (used by stochastic-mask objectives; unused here).
        ``gather_axis``: mesh axis name over which contrastive embeddings are
        all-gathered so the logit matrix spans the GLOBAL batch (negatives
        scale with chip count). None = single-device/global batch already.
        """
        c = self.cfg
        out = self(batch, train=train)
        if c.regression:
            pred = out[:, 0]
            return L.mse_loss(pred, batch.redshift), {"pred": pred}
        if c.classification:
            weights = jnp.asarray(CLASS_WEIGHTS[c.n_classes]) if c.n_classes in CLASS_WEIGHTS else None
            loss = L.weighted_cross_entropy(out, batch.label, weights)
            return loss, {"logits": out}
        pair_loss = {
            "sigmoid": L.sigmoid_loss_multimodal,
            "softmax": L.clip_loss_multimodal,
        }[c.loss]
        if gather_axis is not None:
            embs = L.all_gather_embeddings(out, gather_axis)
        else:
            embs = out
        loss = pair_loss(embs, self.logit_scale, self.logit_bias)
        return loss, {"embeddings": out}
