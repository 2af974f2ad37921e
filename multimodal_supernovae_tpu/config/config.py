"""Config system: the reference's W&B sweep-YAML format, W&B-free.

Accepts the same schema the reference feeds ``wandb.sweep``
(configs/*.yaml): a ``parameters.<name>.values`` list per swept
hyperparameter plus an un-swept ``extra_args`` block (wandb_utils.py:7-42
strips ``extra_args`` before creating the sweep). Here the grid is expanded
locally with itertools.product — a sweep is just a list of flattened run
configs — and W&B is optional observability, not the orchestrator.

``build_clip_config`` maps a flattened run config to a ``CLIPConfig`` with
the same key conventions as the reference's ``initialize_model`` /
``train_sweep`` (models_multimodal.py:616-653, script_wandb.py:124-181),
including the spectral-head fallbacks (``heads_spectral`` defaulting to
``heads``) and the CNN/meta defaults.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, Iterator, List, Optional

import yaml


@dataclasses.dataclass
class SweepConfig:
    parameters: Dict[str, List[Any]]
    extra_args: Dict[str, Any]
    method: str = "grid"
    metric: Optional[Dict[str, Any]] = None
    raw: Optional[Dict[str, Any]] = None

    @property
    def n_points(self) -> int:
        n = 1
        for v in self.parameters.values():
            n *= len(v)
        return n


def load_sweep(path: str) -> SweepConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    params = {}
    for k, spec in (raw.get("parameters") or {}).items():
        if isinstance(spec, dict) and "values" in spec:
            params[k] = list(spec["values"])
        elif isinstance(spec, dict) and "value" in spec:
            params[k] = [spec["value"]]
        else:
            params[k] = [spec]
    return SweepConfig(
        parameters=params,
        extra_args=raw.get("extra_args") or {},
        method=raw.get("method", "grid"),
        metric=raw.get("metric"),
        raw=raw,
    )


def expand_grid(sweep: SweepConfig) -> Iterator[Dict[str, Any]]:
    """Yield flattened per-run configs.

    ``method: grid`` (default) walks the cartesian product in key order;
    ``method: random`` samples uniformly from each parameter's value list
    (the W&B 'random' strategy; cap with extra_args.nruns / max_runs).
    """
    keys = list(sweep.parameters)
    if sweep.method == "random":
        import numpy as np

        rng = np.random.default_rng(int(sweep.extra_args.get("sweep_seed", 0)))
        n = int(sweep.extra_args.get("nruns", 32))
        for _ in range(n):
            yield {k: sweep.parameters[k][rng.integers(len(sweep.parameters[k]))]
                   for k in keys}
        return
    for combo in itertools.product(*(sweep.parameters[k] for k in keys)):
        yield dict(zip(keys, combo))


def build_clip_config(run_cfg: Dict[str, Any], extra: Dict[str, Any], nband: int = 2):
    """Flattened run config + extra_args -> CLIPConfig (+ trainer fields)."""
    from ..models.clip import CLIPConfig

    g = run_cfg.get
    transformer_kwargs = {
        "n_out": run_cfg["n_out"],
        "emb": run_cfg["emb"],
        "heads": run_cfg["heads"],
        "depth": run_cfg["transformer_depth"],
        "dropout": g("dropout", 0.0),
        "time_norm": g("time_norm", 10000.0),
        "agg": g("agg", "mean"),
    }
    transformer_spectral_kwargs = {
        "n_out": run_cfg["n_out"],
        "emb": g("emb_spectral", run_cfg["emb"]),
        "heads": g("heads_spectral", run_cfg["heads"]),
        "depth": g("transformer_depth_spectral", run_cfg["transformer_depth"]),
        "dropout": g("dropout", 0.0),
        "time_norm": g("time_norm_spectral", g("time_norm", 10000.0)),
        "agg": g("agg_spectral", "mean"),
    }
    conv_kwargs = {
        "dim": g("cnn_dim", 32),
        "depth": g("cnn_depth", 2),
        "channels": g("cnn_channels", 3),
        "kernel_size": g("cnn_kernel_size", 5),
        "patch_size": g("cnn_patch_size", 10),
        "n_out": run_cfg["n_out"],
        "dropout_prob": g("dropout", 0.0),
    }
    meta_kwargs = {
        "input_dim": g("meta_input_dim", 128),
        "hidden_dim": g("meta_hidden_dim", 128),
        "num_layers": g("meta_num_layers", 2),
        "dropout": g("dropout", 0.0),
    }
    return CLIPConfig.create(
        combinations=tuple(extra["combinations"]),
        # The reference never passes enc_dim to LightCurveImageCLIP, so its
        # shared embedding space is ALWAYS the constructor default 128
        # (models_multimodal.py:101, :656-670) regardless of n_out.
        enc_dim=int(g("enc_dim", extra.get("enc_dim", 128))),
        logit_scale_init=g("logit_scale", 10.0),
        nband=nband,
        transformer_kwargs=transformer_kwargs,
        transformer_spectral_kwargs=transformer_spectral_kwargs,
        conv_kwargs=conv_kwargs,
        meta_kwargs=meta_kwargs,
        loss=extra.get("loss", "softmax"),
        regression=bool(extra.get("regression", False)),
        classification=bool(extra.get("classification", False)),
        n_classes=int(extra.get("n_classes", 5)),
        # TPU performance knobs (ours; no reference counterpart)
        compute_dtype=extra.get("compute_dtype"),
        use_pallas=extra.get("use_pallas"),
    )


def build_trainer_config(run_cfg: Dict[str, Any], extra: Dict[str, Any]):
    from ..training.trainer import TrainerConfig

    g = run_cfg.get
    return TrainerConfig(
        epochs=int(g("epochs", 10)),
        batch_size=int(g("batchsize", g("batch_size", 32))),
        lr=float(g("lr", 1e-4)),
        weight_decay=float(g("weight_decay", 0.0)),
        patience=int(g("patience", 10**9)),
        seed=int(g("seed", 0)),
        noise_level_img=float(extra.get("noise_level_img", 1.0)),
        noise_level_mag=float(extra.get("noise_level_mag", 1.0)),
        step_size=g("step_size"),
        gamma=g("gamma"),
    )
