"""Model factory: rebuild models and parameters from run directories, plus
weight-surgery builders for the fine-tune/masked entry points and a
reference (torch) checkpoint importer.

Rebuild of the reference's factory trio (models_multimodal.py:559-831):

  * ``load_run_config``    <- load_config (per-run config.yaml + parent
                              sweep_config.yaml extra_args)
  * ``initialize_from_run_dir`` <- initialize_model (nband=2, loss=softmax)
  * ``load_model``         <- load_model (config + weights + the exact
                              train/val filename manifests)

plus ``import_reference_checkpoint``: maps a PyTorch-Lightning ``.ckpt``
state_dict from the reference into this framework's parameter pytree
(transposing torch Linear weights, splitting packed MHA projections),
letting users of the original repo carry their trained models across.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml

from ..config.config import build_clip_config
from ..data.batching import Batch
from .clip import CLIPConfig, CLIPModel
from .clip_mlp import ClipMLPConfig, ClipMLPHead
from .pretraining import MaskedEncoderConfig, MaskedLightCurveEncoder


def load_run_config(run_dir: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(flattened run config, sweep extra_args) for a run directory.

    Mirrors ``load_config`` (models_multimodal.py:559-580): the run's own
    config.yaml plus the parent sweep directory's sweep_config.yaml.
    """
    with open(os.path.join(run_dir, "config.yaml")) as f:
        run_cfg = yaml.safe_load(f)
    sweep_dir = os.path.dirname(os.path.abspath(run_dir))
    with open(os.path.join(sweep_dir, "sweep_config.yaml")) as f:
        extra = yaml.safe_load(f).get("extra_args", {})
    return run_cfg, extra


def initialize_from_run_dir(
    run_dir: str, combinations=None
) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """Build an (uninitialised) model from a run directory's config
    (``initialize_model``, models_multimodal.py:583-680: nband=2, softmax).

    Supervised fine-tune runs produced by scripts/finetune_clip.py (a
    ``pretrain_path`` plus regression/classification in extra_args) rebuild
    as a ClipMLPHead whose CLIP backbone config comes from the PRETRAINED
    run's directory, matching how the run was constructed.
    """
    run_cfg, extra = load_run_config(run_dir)
    if combinations is not None:
        extra = dict(extra, combinations=list(combinations))
    extra = dict(extra, loss="softmax")
    if "f_mask" in run_cfg and not extra.get("pretrain_path"):
        # Masked-pretraining run (ckpts hold net.*/last_layer.* for a
        # MaskedLightCurveEncoder). The reference's own load_model cannot
        # rebuild these (models_multimodal.py:683-758 only handles CLIP);
        # this framework loads every shipped family.
        cfg = MaskedEncoderConfig.create(
            f_mask=float(run_cfg["f_mask"]),
            nband=2,
            transformer_kwargs={
                "n_out": int(run_cfg.get("n_out", 1)),
                "emb": int(run_cfg.get("emb", 128)),
                "heads": int(run_cfg.get("heads", 2)),
                "depth": int(run_cfg.get("transformer_depth", 4)),
                "dropout": float(run_cfg.get("dropout", 0.0)),
                "time_norm": float(run_cfg.get("time_norm", 10000.0)),
            },
        )
        return MaskedLightCurveEncoder(cfg), run_cfg, extra
    supervised = extra.get("regression") or extra.get("classification")
    if extra.get("pretrain_path") and supervised:
        clip_model, _, _ = initialize_from_run_dir(
            extra["pretrain_path"], combinations=extra["combinations"]
        )
        head_cfg = ClipMLPConfig(
            clip=clip_model.cfg,
            combinations=tuple(extra["combinations"]),
            hidden_dim=int(run_cfg.get("hidden_dim", 32)),
            num_layers=int(run_cfg.get("num_layers", 2)),
            dropout=float(run_cfg.get("dropout", 0.0)),
            regression=bool(extra.get("regression", False)),
            classification=bool(extra.get("classification", False)),
            n_classes=int(extra.get("n_classes", 5)),
        )
        return ClipMLPHead(head_cfg), run_cfg, extra
    if "n_out" not in run_cfg and extra.get("pretrain_path"):
        # contrastive fine-tune sweeps may omit architecture keys; the
        # architecture then comes from the pretrained run's directory
        # (finetune_clip.py:131-133 behavior)
        model, _, _ = initialize_from_run_dir(
            extra["pretrain_path"], combinations=extra["combinations"]
        )
        return model, run_cfg, extra
    cfg = build_clip_config(run_cfg, extra, nband=2)
    return CLIPModel(cfg), run_cfg, extra


def load_model(run_dir: str, example_batch: Batch, which: str = "best"):
    """Model + restored variables + split manifests from a run directory
    (``load_model``, models_multimodal.py:683-758).

    Accepts BOTH this framework's run dirs (orbax ckpt_best/ckpt_last) and
    the reference's original run dirs (PyTorch-Lightning ``*.ckpt`` files +
    the same config/manifests) — reference checkpoints are imported via
    ``import_reference_checkpoint`` and merged non-strictly, so existing
    trained artifacts evaluate here unchanged.

    Returns (model, variables, run_cfg, extra, train_filenames,
    val_filenames).
    """
    import jax

    from ..training.checkpoint import load_run_sidecars, merge_params_nonstrict

    model, run_cfg, extra = initialize_from_run_dir(run_dir)
    variables = model.init(jax.random.PRNGKey(0), example_batch)
    if os.path.isdir(os.path.join(run_dir, "ckpt_best")):
        variables = restore_run_variables(run_dir, variables, which)
    else:
        ckpt = _pick_reference_ckpt(run_dir, which)
        imported = import_reference_checkpoint(ckpt)
        stats = imported.pop("__batch_stats__", None)
        variables = dict(
            variables, params=merge_params_nonstrict(variables["params"], imported)
        )
        if stats is not None and "batch_stats" in variables:
            variables["batch_stats"] = merge_params_nonstrict(
                variables["batch_stats"], stats
            )
    _, train_names, val_names = load_run_sidecars(run_dir)
    train_names = sorted(train_names) if train_names else []
    val_names = sorted(val_names) if val_names else []
    return model, variables, run_cfg, extra, train_names, val_names


def _pick_reference_ckpt(run_dir: str, which: str) -> str:
    # some reference run dirs ship last.ckpt as a symlink to the authors'
    # cluster filesystem — skip entries that don't resolve
    ckpts = [
        f for f in os.listdir(run_dir)
        if f.endswith(".ckpt") and os.path.exists(os.path.join(run_dir, f))
    ]
    if not ckpts:
        raise FileNotFoundError(f"no orbax or torch checkpoints in {run_dir}")
    if which == "last" and "last.ckpt" in ckpts:
        return os.path.join(run_dir, "last.ckpt")
    epoch_ckpts = sorted(
        (c for c in ckpts if c.startswith("epoch=")),
        key=lambda c: int(c.split("=")[1].split("-")[0]),
    )
    # smallest-epoch convention of the reference's get_checkpoint_paths
    # (utils.py:779-819)
    pick = epoch_ckpts[0] if epoch_ckpts else ckpts[0]
    return os.path.join(run_dir, pick)


def get_checkpoint_paths(root_dir: str, name: str, id: int):
    """Walk a model family directory and return the smallest-epoch ``.ckpt``
    per run (the reference's batch-eval discovery, utils.py:779-819).
    Returns (paths, [name]*n, [id]*n)."""
    paths = []
    for dirpath, _dirnames, filenames in os.walk(root_dir):
        best_epoch, best = float("inf"), None
        for fname in filenames:
            if not fname.endswith(".ckpt"):
                continue
            try:
                epoch = int(fname.split("=")[1].split("-")[0])
            except (IndexError, ValueError):
                continue
            if epoch < best_epoch:
                best_epoch, best = epoch, os.path.join(dirpath, fname)
        if best:
            paths.append(best)
    return paths, [name] * len(paths), [id] * len(paths)


def restore_run_variables(run_dir: str, template: Dict, which: str = "best"):
    """Restore {params[, batch_stats]} from a run's orbax checkpoints using
    the epoch recorded in summary.json (best) or the latest (last)."""
    import orbax.checkpoint as ocp

    sub = "ckpt_best" if which == "best" else "ckpt_last"
    mgr = ocp.CheckpointManager(os.path.abspath(os.path.join(run_dir, sub)))
    if which == "best":
        with open(os.path.join(run_dir, "summary.json")) as f:
            epoch = json.load(f).get("best_ckpt_epoch")
        if epoch is None:
            epoch = mgr.latest_step()
    else:
        epoch = mgr.latest_step()
    # Restore the full saved tree (params + opt_state + step [+ batch_stats])
    # without a template, then keep the inference-relevant collections.
    # fallback_sharding makes checkpoints portable across backends (a run
    # trained on TPU must evaluate on CPU and vice versa — orbax otherwise
    # pins restores to the devices recorded at save time).
    import jax
    from jax.sharding import SingleDeviceSharding

    fallback = SingleDeviceSharding(jax.local_devices()[0])
    restored = mgr.restore(
        int(epoch), args=ocp.args.StandardRestore(None, fallback_sharding=fallback)
    )
    mgr.close()
    out = {"params": restored["params"]}
    if "batch_stats" in template:
        out["batch_stats"] = restored.get("batch_stats", template["batch_stats"])
    return out


# -- model builders for the entry points -------------------------------------


def finetune_model_builder(extra: Dict[str, Any]):
    """Builder for scripts/finetune_clip.py.

    The pretrained run's config defines the architecture
    (finetune_clip.py:131-133); its weights are loaded non-strictly; with
    regression/classification the CLIP is wrapped in an MLP head (ClipMLP,
    finetune_clip.py:144-155), otherwise contrastive training continues.
    """
    from ..training.checkpoint import merge_params_nonstrict
    from ..training.optim import freeze_encoders_except_projection

    pretrain_dir = extra["pretrain_path"]
    freeze_backbone = bool(extra.get("freeze_backbone", False))
    regression = bool(extra.get("regression", False))
    classification = bool(extra.get("classification", False))

    def builder(run_cfg, _extra, nband):
        model, pre_cfg, pre_extra = initialize_from_run_dir(
            pretrain_dir, combinations=extra["combinations"]
        )
        pre_params = _load_pretrained_params(pretrain_dir, model)

        if regression or classification:
            head_cfg = ClipMLPConfig(
                clip=model.cfg,
                combinations=tuple(extra["combinations"]),
                hidden_dim=int(run_cfg.get("hidden_dim", 32)),
                num_layers=int(run_cfg.get("num_layers", 2)),
                dropout=float(run_cfg.get("dropout", 0.0)),
                regression=regression,
                classification=classification,
                n_classes=int(extra.get("n_classes", 5)),
            )
            head = ClipMLPHead(head_cfg)
            task = "regression" if regression else "classification"

            def override(params):
                params = dict(params)
                params["clip_model"] = merge_params_nonstrict(
                    params["clip_model"], pre_params
                )
                return params

            freeze = None
            if freeze_backbone:
                freeze = freeze_encoders_except_projection(
                    ["lightcurve_encoder", "spectral_encoder"]
                )
            return head, task, freeze, override

        def override(params):
            return merge_params_nonstrict(params, pre_params)

        freeze = None
        if freeze_backbone:
            freeze = freeze_encoders_except_projection(
                ["lightcurve_encoder", "spectral_encoder"]
            )
        return model, "contrastive", freeze, override

    return builder


def _load_pretrained_params(run_dir: str, model) -> Dict:
    """Restore a pretrained run's params given its own model structure."""
    import jax

    from ..data.synthetic import make_synthetic_dataset

    combos = model.cfg.combinations
    ds = make_synthetic_dataset(
        n=2, n_max_lc=4, nband=model.cfg.nband, n_max_sp=4,
        modalities=[m for m in combos if m != "meta"] or ["lightcurve"],
    )
    batch = ds.host_batch(np.arange(2))
    template = model.init(jax.random.PRNGKey(0), batch)
    return restore_run_variables(run_dir, template)["params"]


def masked_model_builder(extra: Dict[str, Any]):
    """Builder for scripts/pretrain_masked.py: MaskedLightCurveEncoder from
    the grid's f_mask / emb / heads / transformer_depth keys
    (configs/config_grid.yaml:62-73)."""

    def builder(run_cfg, _extra, nband):
        cfg = MaskedEncoderConfig.create(
            f_mask=float(run_cfg.get("f_mask", 0.15)),
            nband=nband,
            transformer_kwargs={
                "n_out": 1,
                "emb": int(run_cfg.get("emb", 128)),
                "heads": int(run_cfg.get("heads", 2)),
                "depth": int(run_cfg.get("transformer_depth", 4)),
                "dropout": float(run_cfg.get("dropout", 0.0)),
                "time_norm": float(run_cfg.get("time_norm", 10000.0)),
            },
        )
        return MaskedLightCurveEncoder(cfg), "masked", None, None

    return builder


# -- reference (torch) checkpoint import --------------------------------------


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _import_seq_encoder(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference TransformerWithTimeEmbeddings state_dict subtree -> our
    SequenceEncoder param dict (name mapping documented in
    models/transformer.py)."""
    g = lambda k: np.asarray(sd[prefix + k])
    out: Dict[str, Any] = {
        "embedding_mag": {"kernel": _t(g("embedding_mag.weight")),
                          "bias": g("embedding_mag.bias")},
        "projection": {"kernel": _t(g("projection.weight")),
                       "bias": g("projection.bias")},
    }
    if prefix + "band_emb.weight" in sd:
        out["band_emb"] = {"embedding": g("band_emb.weight")}
    blocks = {}
    i = 0
    while f"{prefix}transformer.tblocks.{i}.norm1.weight" in sd:
        b = f"transformer.tblocks.{i}."
        blocks[f"block_{i}"] = {
            "attention": {
                "tokeys": {"kernel": _t(g(b + "attention.tokeys.weight"))},
                "toqueries": {"kernel": _t(g(b + "attention.toqueries.weight"))},
                "tovalues": {"kernel": _t(g(b + "attention.tovalues.weight"))},
                "unifyheads": {"kernel": _t(g(b + "attention.unifyheads.weight")),
                               "bias": g(b + "attention.unifyheads.bias")},
            },
            "norm1": {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")},
            "norm2": {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")},
            "ff_in": {"kernel": _t(g(b + "ff.0.weight")), "bias": g(b + "ff.0.bias")},
            "ff_out": {"kernel": _t(g(b + "ff.2.weight")), "bias": g(b + "ff.2.bias")},
        }
        i += 1
    out["transformer"] = blocks
    if prefix + "query" in sd:
        e = g("query" if prefix == "" else prefix + "query").shape[0]
        in_proj_w = g(prefix + "agg_attn.in_proj_weight")
        in_proj_b = g(prefix + "agg_attn.in_proj_bias")
        out["query"] = g(prefix + "query")
        out["agg_attn"] = {
            "q_proj": {"kernel": _t(in_proj_w[:e]), "bias": in_proj_b[:e]},
            "k_proj": {"kernel": _t(in_proj_w[e : 2 * e]), "bias": in_proj_b[e : 2 * e]},
            "v_proj": {"kernel": _t(in_proj_w[2 * e :]), "bias": in_proj_b[2 * e :]},
            "out_proj": {"kernel": _t(g(prefix + "agg_attn.out_proj.weight")),
                         "bias": g(prefix + "agg_attn.out_proj.bias")},
        }
    return out


def import_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Reference Lightning .ckpt -> partial CLIP params pytree.

    Covers the sequence encoders, projections, logit scale/bias, the meta
    encoder, supervised heads, masked-pretrainer subtrees, and the ConvMixer
    image encoder (NCHW conv kernels transposed to NHWC; BatchNorm running
    stats returned under the reserved ``__batch_stats__`` key, which callers
    merge into the batch_stats collection).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    params: Dict[str, Any] = {}
    if "logit_scale" in sd:
        params["logit_scale"] = np.asarray(sd["logit_scale"])
        params["logit_bias"] = np.asarray(sd["logit_bias"])
    for enc, proj in [
        ("lightcurve_encoder", "lightcurve_projection"),
        ("spectral_encoder", "spectral_projection"),
    ]:
        if f"{enc}.embedding_mag.weight" in sd:
            params[enc] = _import_seq_encoder(sd, enc + ".")
            params[proj] = {
                "kernel": _t(sd[f"{proj}.weight"]),
                "bias": np.asarray(sd[f"{proj}.bias"]),
            }
    # host-galaxy ConvMixer: NCHW conv kernels -> NHWC, BatchNorm running
    # stats -> the batch_stats collection
    if "image_encoder.net.0.weight" in sd:
        conv_params, conv_stats = _import_convmixer(sd, "image_encoder.")
        params["image_encoder"] = conv_params
        params.setdefault("__batch_stats__", {})["image_encoder"] = conv_stats
        params["image_projection"] = {
            "kernel": _t(sd["image_projection.weight"]),
            "bias": np.asarray(sd["image_projection.bias"]),
        }
    # meta encoder: class embedding + MLP (models_multimodal.py:190-193)
    if "class_emb.weight" in sd:
        params["class_emb"] = {"embedding": np.asarray(sd["class_emb.weight"])}
        params["meta_encoder"] = _import_mlp(sd, "meta_encoder.")
    # supervised head (regression/classification Linear)
    if "linear.weight" in sd:
        params["linear"] = {
            "kernel": _t(sd["linear.weight"]),
            "bias": np.asarray(sd["linear.bias"]),
        }
    # masked pretrainer export (net.* + last_layer.*)
    if "net.embedding_mag.weight" in sd:
        params["net"] = _import_seq_encoder(sd, "net.")
        params["last_layer"] = {
            "kernel": _t(sd["last_layer.weight"]),
            "bias": np.asarray(sd["last_layer.bias"]),
        }
    return params


def _conv_kernel(w) -> np.ndarray:
    """torch conv weight (out, in/groups, kh, kw) -> flax (kh, kw, in/groups,
    out)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _import_convmixer(sd: Dict[str, Any], prefix: str):
    """Reference ConvMixer state dict (models_multimodal.py:38-95 Sequential
    layout: net.0 patch conv, net.2 BN, then per depth-i block
    net.{3+i}.0.fn.0 depthwise conv / .0.fn.2 BN / .1 pointwise conv /
    .3 BN; projection.2 and projection.5 Linears) -> (params, batch_stats)
    for models/convmixer.py (NHWC)."""
    g = lambda k: np.asarray(sd[prefix + k])

    def bn(key):
        return (
            {"scale": g(key + ".weight"), "bias": g(key + ".bias")},
            {"mean": g(key + ".running_mean"), "var": g(key + ".running_var")},
        )

    params: Dict[str, Any] = {
        "patch_embed": {"kernel": _conv_kernel(g("net.0.weight"))},
        "head_fc1": {"kernel": _t(g("projection.2.weight")),
                     "bias": g("projection.2.bias")},
        "head_fc2": {"kernel": _t(g("projection.5.weight")),
                     "bias": g("projection.5.bias")},
    }
    stats: Dict[str, Any] = {}
    params["patch_bn"], stats["patch_bn"] = bn("net.2")
    i = 0
    while f"{prefix}net.{3 + i}.0.fn.0.weight" in sd:
        blk = f"net.{3 + i}"
        params[f"dw_conv_{i}"] = {
            "kernel": _conv_kernel(g(blk + ".0.fn.0.weight")),
            "bias": g(blk + ".0.fn.0.bias"),
        }
        params[f"dw_bn_{i}"], stats[f"dw_bn_{i}"] = bn(blk + ".0.fn.2")
        params[f"pw_conv_{i}"] = {
            "kernel": _conv_kernel(g(blk + ".1.weight")),
            "bias": g(blk + ".1.bias"),
        }
        params[f"pw_bn_{i}"], stats[f"pw_bn_{i}"] = bn(blk + ".3")
        i += 1
    return params, stats


def _import_mlp(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference MLP (Linear-ReLU-Dropout stack in a flat ModuleList,
    models_multimodal.py:843-851) -> our MLP param dict. Linear layers sit
    at indices 0, 3, 6, ... with the output head last."""
    idxs = sorted(
        int(k[len(prefix) + len("layers.") : -len(".weight")])
        for k in sd
        if k.startswith(prefix + "layers.") and k.endswith(".weight")
    )
    out: Dict[str, Any] = {}
    for n, i in enumerate(idxs):
        name = "out" if i == idxs[-1] else f"hidden_{n}"
        out[name] = {
            "kernel": _t(sd[f"{prefix}layers.{i}.weight"]),
            "bias": np.asarray(sd[f"{prefix}layers.{i}.bias"]),
        }
    return out
