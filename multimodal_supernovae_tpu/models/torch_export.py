"""Export trained parameters as a reference-compatible torch ``.ckpt``.

The exact inverse of ``factory.import_reference_checkpoint``: this
framework's flax parameter pytree becomes a state_dict whose keys, shapes,
and layouts match the reference's torch modules
(src/models_multimodal.py:98-556, src/models_pretraining.py:17-259), so
``model.load_state_dict(torch.load(path)["state_dict"])`` — the reference's
own STRICT load (src/models_multimodal.py:683-758) — consumes it unchanged.

Together with the importer this closes the migration loop in both
directions: reference users bring their trained ``.ckpt`` files here
(factory.py), and models trained here go back into the reference's
evaluation / fine-tuning stack (or any torch tooling) without retraining.

Covered families (the same set the importer covers):

  * ``LightCurveImageCLIP`` in all three modes — sequence encoders +
    projections, logit scale/bias, the ConvMixer image tower (NHWC conv
    kernels back to NCHW, BatchNorm running stats from the batch_stats
    collection, ``num_batches_tracked`` synthesized), the meta encoder
    (class embedding + MLP re-flattened to the reference's ModuleList
    indices), attention aggregation (q/k/v re-packed into torch
    MultiheadAttention's ``in_proj_weight``), and the supervised
    ``linear`` head;
  * ``MaskedLightCurveEncoder`` (``net.* + last_layer.*``);
  * ``ClipMLP`` (``clip_model.* + mlp_model.*``).

The ViT image tower (models/vit.py) has no reference counterpart and is
rejected with a clear error rather than silently dropped.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "export_reference_state_dict",
    "export_reference_checkpoint",
    "export_run_dir_to_reference",
]


def _w(kernel) -> np.ndarray:
    """flax Dense kernel (in, out) -> torch Linear weight (out, in)."""
    return np.ascontiguousarray(np.asarray(kernel, dtype=np.float32).T)


def _a(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _export_seq_encoder(p: Dict[str, Any], prefix: str,
                        n_out: Optional[int] = None) -> Dict[str, np.ndarray]:
    """SequenceEncoder params -> reference TransformerWithTimeEmbeddings
    state_dict subtree (inverse of factory._import_seq_encoder).

    The reference defines ``self.projection`` unconditionally
    (src/transformer_utils.py:200) but never calls it under
    ``agg='pretraining'`` (:248-251), so its STRICT loader still expects the
    dead keys; our pretraining tower never creates the layer. When the
    params lack it, zeros of shape (n_out, emb) are synthesized — ``n_out``
    then must be given (the masked families' transformer_kwargs carry it)."""
    sd: Dict[str, np.ndarray] = {
        prefix + "embedding_mag.weight": _w(p["embedding_mag"]["kernel"]),
        prefix + "embedding_mag.bias": _a(p["embedding_mag"]["bias"]),
    }
    if "projection" in p:
        sd[prefix + "projection.weight"] = _w(p["projection"]["kernel"])
        sd[prefix + "projection.bias"] = _a(p["projection"]["bias"])
    else:
        if n_out is None:
            raise ValueError(
                f"{prefix}: params carry no projection layer (a pretraining-"
                "agg tower) — pass n_out so the reference's dead projection "
                "keys can be synthesized for its strict load")
        emb = int(np.asarray(p["embedding_mag"]["kernel"]).shape[1])
        sd[prefix + "projection.weight"] = np.zeros(
            (int(n_out), emb), dtype=np.float32)
        sd[prefix + "projection.bias"] = np.zeros(int(n_out), dtype=np.float32)
    if "band_emb" in p:
        sd[prefix + "band_emb.weight"] = _a(p["band_emb"]["embedding"])
    i = 0
    while f"block_{i}" in p["transformer"]:
        blk = p["transformer"][f"block_{i}"]
        b = f"{prefix}transformer.tblocks.{i}."
        att = blk["attention"]
        sd[b + "attention.tokeys.weight"] = _w(att["tokeys"]["kernel"])
        sd[b + "attention.toqueries.weight"] = _w(att["toqueries"]["kernel"])
        sd[b + "attention.tovalues.weight"] = _w(att["tovalues"]["kernel"])
        sd[b + "attention.unifyheads.weight"] = _w(att["unifyheads"]["kernel"])
        sd[b + "attention.unifyheads.bias"] = _a(att["unifyheads"]["bias"])
        sd[b + "norm1.weight"] = _a(blk["norm1"]["scale"])
        sd[b + "norm1.bias"] = _a(blk["norm1"]["bias"])
        sd[b + "norm2.weight"] = _a(blk["norm2"]["scale"])
        sd[b + "norm2.bias"] = _a(blk["norm2"]["bias"])
        sd[b + "ff.0.weight"] = _w(blk["ff_in"]["kernel"])
        sd[b + "ff.0.bias"] = _a(blk["ff_in"]["bias"])
        sd[b + "ff.2.weight"] = _w(blk["ff_out"]["kernel"])
        sd[b + "ff.2.bias"] = _a(blk["ff_out"]["bias"])
        i += 1
    if "query" in p:
        # torch nn.MultiheadAttention packs q/k/v as rows of in_proj_weight
        agg = p["agg_attn"]
        sd[prefix + "query"] = _a(p["query"])
        sd[prefix + "agg_attn.in_proj_weight"] = np.concatenate(
            [_w(agg["q_proj"]["kernel"]), _w(agg["k_proj"]["kernel"]),
             _w(agg["v_proj"]["kernel"])], axis=0)
        sd[prefix + "agg_attn.in_proj_bias"] = np.concatenate(
            [_a(agg["q_proj"]["bias"]), _a(agg["k_proj"]["bias"]),
             _a(agg["v_proj"]["bias"])], axis=0)
        sd[prefix + "agg_attn.out_proj.weight"] = _w(agg["out_proj"]["kernel"])
        sd[prefix + "agg_attn.out_proj.bias"] = _a(agg["out_proj"]["bias"])
    return sd


def _conv_w(kernel) -> np.ndarray:
    """flax conv kernel (kh, kw, in/groups, out) -> torch (out, in/groups,
    kh, kw)."""
    return np.ascontiguousarray(
        np.asarray(kernel, dtype=np.float32).transpose(3, 2, 0, 1))


def _export_convmixer(p: Dict[str, Any], stats: Dict[str, Any],
                      prefix: str) -> Dict[str, np.ndarray]:
    """ConvMixer params + batch_stats -> the reference's Sequential layout
    (inverse of factory._import_convmixer). ``num_batches_tracked`` — a
    torch BatchNorm buffer with no flax counterpart — is synthesized as 0;
    it only feeds torch's momentum=None averaging mode, which the
    reference never uses."""
    sd: Dict[str, np.ndarray] = {}

    def bn(our: str, ref: str):
        sd[ref + ".weight"] = _a(p[our]["scale"])
        sd[ref + ".bias"] = _a(p[our]["bias"])
        sd[ref + ".running_mean"] = _a(stats[our]["mean"])
        sd[ref + ".running_var"] = _a(stats[our]["var"])
        sd[ref + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    sd[prefix + "net.0.weight"] = _conv_w(p["patch_embed"]["kernel"])
    bn("patch_bn", prefix + "net.2")
    i = 0
    while f"dw_conv_{i}" in p:
        blk = f"{prefix}net.{3 + i}"
        sd[blk + ".0.fn.0.weight"] = _conv_w(p[f"dw_conv_{i}"]["kernel"])
        sd[blk + ".0.fn.0.bias"] = _a(p[f"dw_conv_{i}"]["bias"])
        bn(f"dw_bn_{i}", blk + ".0.fn.2")
        sd[blk + ".1.weight"] = _conv_w(p[f"pw_conv_{i}"]["kernel"])
        sd[blk + ".1.bias"] = _a(p[f"pw_conv_{i}"]["bias"])
        bn(f"pw_bn_{i}", blk + ".3")
        i += 1
    sd[prefix + "projection.2.weight"] = _w(p["head_fc1"]["kernel"])
    sd[prefix + "projection.2.bias"] = _a(p["head_fc1"]["bias"])
    sd[prefix + "projection.5.weight"] = _w(p["head_fc2"]["kernel"])
    sd[prefix + "projection.5.bias"] = _a(p["head_fc2"]["bias"])
    return sd


def _export_mlp(p: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Our MLP params (hidden_0..hidden_{h-1}, out) -> the reference MLP's
    flat ModuleList (Linear at 0, 3, 6, ...; models_multimodal.py:843-851)."""
    hidden = sorted(
        (int(k.split("_")[1]) for k in p if k.startswith("hidden_")))
    sd: Dict[str, np.ndarray] = {}
    for n in hidden:
        sd[f"{prefix}layers.{3 * n}.weight"] = _w(p[f"hidden_{n}"]["kernel"])
        sd[f"{prefix}layers.{3 * n}.bias"] = _a(p[f"hidden_{n}"]["bias"])
    out_idx = 3 * len(hidden)
    sd[f"{prefix}layers.{out_idx}.weight"] = _w(p["out"]["kernel"])
    sd[f"{prefix}layers.{out_idx}.bias"] = _a(p["out"]["bias"])
    return sd


def export_reference_state_dict(
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    prefix: str = "",
    n_out: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Flax params (+ batch_stats for BatchNorm towers) -> a state_dict of
    numpy arrays keyed and laid out for the reference's torch modules.

    ``n_out``: required only when exporting a freshly-initialised masked
    pretrainer (see _export_seq_encoder on the reference's dead projection
    keys); checkpoints imported FROM the reference round-trip without it."""
    sd: Dict[str, np.ndarray] = {}
    if "clip_model" in params:  # ClipMLPHead -> reference ClipMLP
        sd.update(export_reference_state_dict(
            params["clip_model"],
            (batch_stats or {}).get("clip_model"),
            prefix=prefix + "clip_model.",
        ))
        sd.update(_export_mlp(params["mlp_model"], prefix + "mlp_model."))
        return sd
    if "net" in params:  # MaskedLightCurveEncoder
        sd.update(_export_seq_encoder(params["net"], prefix + "net.",
                                      n_out=n_out))
        sd[prefix + "last_layer.weight"] = _w(params["last_layer"]["kernel"])
        sd[prefix + "last_layer.bias"] = _a(params["last_layer"]["bias"])
        return sd

    # LightCurveImageCLIP
    if "logit_scale" in params:
        sd[prefix + "logit_scale"] = _a(params["logit_scale"])
        sd[prefix + "logit_bias"] = _a(params["logit_bias"])
    for enc, proj in [
        ("lightcurve_encoder", "lightcurve_projection"),
        ("spectral_encoder", "spectral_projection"),
    ]:
        if enc in params:
            sd.update(_export_seq_encoder(params[enc], prefix + enc + "."))
            sd[prefix + proj + ".weight"] = _w(params[proj]["kernel"])
            sd[prefix + proj + ".bias"] = _a(params[proj]["bias"])
    if "image_encoder" in params:
        if "patch_bn" not in params["image_encoder"]:
            raise ValueError(
                "image tower is not a ConvMixer (image_encoder: vit has no "
                "reference counterpart to export to)")
        stats = (batch_stats or {}).get("image_encoder")
        if stats is None:
            raise ValueError(
                "exporting a ConvMixer tower needs the batch_stats "
                "collection (BatchNorm running statistics)")
        sd.update(_export_convmixer(
            params["image_encoder"], stats, prefix + "image_encoder."))
        sd[prefix + "image_projection.weight"] = _w(
            params["image_projection"]["kernel"])
        sd[prefix + "image_projection.bias"] = _a(
            params["image_projection"]["bias"])
    if "class_emb" in params:
        sd[prefix + "class_emb.weight"] = _a(params["class_emb"]["embedding"])
        sd.update(_export_mlp(params["meta_encoder"], prefix + "meta_encoder."))
    if "linear" in params:  # supervised regression/classification head
        sd[prefix + "linear.weight"] = _w(params["linear"]["kernel"])
        sd[prefix + "linear.bias"] = _a(params["linear"]["bias"])
    if not sd:
        raise ValueError(
            f"unrecognized parameter tree (top-level keys: {sorted(params)})")
    return sd


def export_reference_checkpoint(
    params: Dict[str, Any],
    path: str,
    batch_stats: Optional[Dict[str, Any]] = None,
    epoch: int = 0,
    global_step: int = 0,
    n_out: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Write a reference-consumable ``.ckpt`` (torch.save) at ``path``.

    Carries the Lightning bookkeeping keys the reference's checkpoints
    have (epoch / global_step / version) so downstream tooling that reads
    them keeps working; the reference's load path only uses
    ``["state_dict"]``."""
    import torch

    sd = export_reference_state_dict(params, batch_stats, n_out=n_out)
    payload = {
        "epoch": int(epoch),
        "global_step": int(global_step),
        "pytorch-lightning_version": "0.0.0+multimodal_supernovae_tpu",
        "state_dict": {k: torch.tensor(np.asarray(v))
                       for k, v in sd.items()},
    }
    torch.save(payload, path)
    return sd


def export_run_dir_to_reference(
    run_dir: str, out_dir: str, which: str = "best"
) -> str:
    """Convert one of this framework's run directories into a
    reference-style run directory: ``config.yaml`` + the split manifests
    copied verbatim (the contracts already match — training/checkpoint.py),
    the parent sweep dir's ``sweep_config.yaml`` placed one level above
    ``out_dir`` (the reference's ``load_config`` reads
    ``{run_dir}/../sweep_config.yaml`` — models_multimodal.py:559-580, so
    the exported tree feeds ``initialize_model``/``load_model`` directly),
    plus an ``epoch=E-step=S.ckpt`` holding the exported weights. Returns
    the checkpoint path.

    Caveat (the reference's, not ours): its ``initialize_model`` hardcodes
    ``enc_dim=128`` (models_multimodal.py:657-670 passes no enc_dim), so a
    run trained with any other shared-space width exports fine but the
    reference rebuilds the wrong projection shape and its strict load
    fails. A warning is emitted in that case; the ckpt itself still loads
    into a hand-constructed LightCurveImageCLIP(enc_dim=...)."""
    import json
    import shutil
    import warnings

    import jax

    from ..data.synthetic import make_synthetic_dataset
    from .factory import initialize_from_run_dir, restore_run_variables

    model, run_cfg, extra = initialize_from_run_dir(run_dir)
    enc_dim = int(run_cfg.get("enc_dim", 128))
    if enc_dim != 128 and "f_mask" not in run_cfg:
        warnings.warn(
            f"run uses enc_dim={enc_dim}; the reference's initialize_model "
            "hardcodes 128 (models_multimodal.py:657) and will fail its "
            "strict load — construct LightCurveImageCLIP(enc_dim="
            f"{enc_dim}, ...) by hand to consume this export")
    combos = tuple(extra.get("combinations", ("lightcurve",)))
    ds = make_synthetic_dataset(
        n=2, n_max_lc=4, nband=int(extra.get("nband", 2)), n_max_sp=4,
        modalities=[m for m in combos if m != "meta"] or ["lightcurve"],
    )
    batch = ds.host_batch(np.arange(2))
    template = model.init(jax.random.PRNGKey(0), batch)
    variables = restore_run_variables(run_dir, template, which=which)

    epoch = 0
    summary = os.path.join(run_dir, "summary.json")
    if os.path.exists(summary):
        with open(summary) as f:
            s = json.load(f)
        key = "best_ckpt_epoch" if which == "best" else "epochs_trained"
        epoch = int(s.get(key) or s.get("best_ckpt_epoch") or 0)

    os.makedirs(out_dir, exist_ok=True)
    for name in ("config.yaml", "train_filenames.txt", "val_filenames.txt"):
        src = os.path.join(run_dir, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, name))
    sweep_sidecar = os.path.join(
        os.path.dirname(os.path.abspath(run_dir)), "sweep_config.yaml")
    if os.path.exists(sweep_sidecar):
        shutil.copy2(
            sweep_sidecar,
            os.path.join(os.path.dirname(os.path.abspath(out_dir)),
                         "sweep_config.yaml"))
    ckpt = os.path.join(out_dir, f"epoch={epoch}-step=0.ckpt")
    # masked runs: the factory's n_out default (factory.py masked branch)
    n_out = int(run_cfg.get("n_out", 1)) if "f_mask" in run_cfg else None
    export_reference_checkpoint(
        variables["params"], ckpt,
        batch_stats=variables.get("batch_stats"), epoch=epoch, n_out=n_out,
    )
    return ckpt
