"""Experiment orchestration: sweep directories, per-run setup, post-fit
reports.

Rebuild of the reference's W&B-driven L4 layer (wandb_utils.py +
script_wandb.py/train_sweep). A "sweep" is the same YAML grid; scheduling is
local (config.expand_grid) instead of a W&B agent, with the same on-disk
contract the evaluation layer consumes:

  analysis/<sweep_name>/sweep_config.yaml          (wandb_utils.py:28-35)
  analysis/<sweep_name>/<run_name>/config.yaml     (script_wandb.py:70-72)
  analysis/<sweep_name>/<run_name>/{train,val}_filenames.txt  (:58-67)
  analysis/<sweep_name>/<run_name>/ckpt_best/, ckpt_last/, metrics.jsonl

Per run (train_sweep, script_wandb.py:32-271): seed, fold-or-random split,
model from the flattened config, optional pretrained-backbone graft +
freeze, fit, then loss-history and retrieval-curve reports for contrastive
runs.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, Optional

import numpy as np
import yaml

from ..config.config import (
    SweepConfig,
    SweepScheduler,
    build_clip_config,
    build_trainer_config,
)
from ..data.batching import ArrayDataset
from ..data.folds import split_for_run
from ..models.clip import CLIPModel
from ..utils.seed import set_seed
from .checkpoint import load_params
from .optim import (
    freeze_encoder_except_projection,
    freeze_encoders_except_projection,
)
from .trainer import Trainer


def make_sweep_dir(sweep: SweepConfig, analysis_path: str, name: str) -> str:
    sweep_dir = os.path.join(analysis_path, name)
    os.makedirs(sweep_dir, exist_ok=True)
    with open(os.path.join(sweep_dir, "sweep_config.yaml"), "w") as f:
        yaml.safe_dump(sweep.raw, f)
    return sweep_dir


def completed_summary(run_dir: str) -> Optional[Dict[str, Any]]:
    """The run's ``summary.json`` if the run COMPLETED (the summary is
    written once, after fit returns — utils/logging.py:set_summary), else
    None. This is the sweep-level continue marker: the reference re-enters
    a sweep by id and W&B skips finished runs (src/wandb_utils.py:45-50);
    here a finished run is one whose directory holds a summary."""
    path = os.path.join(run_dir, "summary.json")
    if not os.path.exists(path):
        return None
    import json

    with open(path) as f:
        return json.load(f)


def _objective_from_summary(
    summary: Dict[str, Any], sweep: SweepConfig
) -> Optional[float]:
    """Recover the sweep objective from a completed run's summary so a
    resumed random/bayes schedule can still observe skipped runs."""
    name = (sweep.metric or {}).get("name", "best_val_loss")
    if summary.get(name) is not None:
        return float(summary[name])
    if summary.get("best_val_loss") is not None:
        return float(summary["best_val_loss"])
    return None


def _skipped_result(run_dir: str, run_cfg, summary: Dict[str, Any]):
    """Result row for a run skipped because it already completed."""
    value = next(
        (
            v
            for k, v in summary.items()
            if k.startswith("best_")
            and k not in ("best_epoch", "best_ckpt_epoch", "best_val_loss",
                          "best_auc")
            and v is not None
        ),
        summary.get("best_val_loss"),
    )
    return {
        "run_dir": run_dir,
        "run_cfg": run_cfg,
        "skipped": True,
        "summary": summary,
        "best": {"value": value, "epoch": summary.get("best_epoch", -1)},
        "history": {"train_loss": [], "val_loss": []},
        "epochs_run": 0,
        "wall_time_s": 0.0,
    }


def task_of(extra: Dict[str, Any]) -> str:
    if extra.get("regression"):
        return "regression"
    if extra.get("classification"):
        return "classification"
    return "contrastive"


def run_sweep(
    sweep: SweepConfig,
    dataset: ArrayDataset,
    nband: int,
    folds,
    sweep_dir: str,
    model_builder: Optional[Callable] = None,
    mesh=None,
    use_wandb: bool = False,
    max_runs: Optional[int] = None,
    epochs_override: Optional[int] = None,
    resume: bool = False,
    parallel_folds: bool = False,
    parallel_members: bool = False,
):
    """Train every grid point (the wandb.agent loop, script_wandb.py:339).

    ``model_builder(run_cfg, extra, nband) -> (model, task, freeze,
    params_override)`` customises model construction (used by the finetune
    and masked-pretraining entry points); default builds a CLIPModel.
    ``parallel_folds=True`` groups grid points that differ ONLY in
    ``foldnumber`` and trains each group as ONE vmapped program
    (training/ensemble.py) — same run directories; measured at the
    reference's real-data batch 32, 5 folds cost 3.6x one fold's step time
    (1.37x wall speedup) plus one XLA compile instead of five
    (benchmarks/ensemble_results.json). ``parallel_members=True``
    additionally groups across ``seed`` and ``lr`` (a seed-ensemble or the
    reference's lr grid, configs/config_grid.yaml, stacks the same way —
    fit_members carries per-member seeds and learning rates). ``resume``
    restores each unfinished run's checkpoint AND skips grid points whose
    run directory already holds a completed ``summary.json`` (the
    reference's continue_sweep semantics). Returns the per-run result
    dicts.
    """
    extra = sweep.extra_args
    results = []
    scheduler = SweepScheduler(sweep, max_runs=max_runs)

    if parallel_folds or parallel_members:
        if use_wandb:
            import warnings

            warnings.warn(
                "parallel folds/members log metrics.jsonl only; --wandb is "
                "ignored"
            )
        return _run_sweep_parallel_folds(
            sweep, dataset, nband, folds, sweep_dir, scheduler,
            model_builder=model_builder, mesh=mesh,
            epochs_override=epochs_override, resume=resume,
            vary_keys=(
                ("foldnumber", "seed", "lr") if parallel_members
                else ("foldnumber",)
            ),
        )

    for k in range(scheduler.n_runs):
        run_cfg = scheduler.suggest()
        if run_cfg is None:
            break
        run_name = f"run-{k}"
        run_dir = os.path.join(sweep_dir, run_name)
        if resume:
            summary = completed_summary(run_dir)
            if summary is not None:
                # continue_sweep semantics: a finished grid point is not
                # re-walked (no dataset upload / state init / reports) —
                # its recorded objective still feeds the scheduler
                res = _skipped_result(run_dir, run_cfg, summary)
                results.append(res)
                scheduler.observe(
                    run_cfg, _objective_from_summary(summary, sweep)
                )
                continue
        rng, _ = set_seed(int(run_cfg.get("seed", 0)))

        inds_train, inds_val = split_for_run(
            len(dataset),
            float(extra.get("val_fraction", 0.2)),
            int(run_cfg.get("seed", 0)),
            folds=folds,
            foldnumber=run_cfg.get("foldnumber"),
        )
        train_ds = dataset.subset(inds_train)
        val_ds = dataset.subset(inds_val)

        model, task, freeze, params_override, tcfg = _build_run(
            run_cfg, extra, nband, model_builder, epochs_override
        )
        trainer = Trainer(
            model,
            task=task,
            cfg=tcfg,
            run_dir=run_dir,
            mesh=mesh,
            freeze=freeze,
            use_wandb=use_wandb,
            n_classes=int(extra.get("n_classes", 5)),
        )
        state = None
        if params_override is not None:
            trainer.set_dataset_size(len(train_ds))
            example = train_ds.host_batch(
                np.arange(min(tcfg.batch_size, len(train_ds)))
            )
            state = trainer.init_state(example)
            state = state.replace(params=params_override(state.params))

        res = trainer.fit(
            train_ds, val_ds, config_dump=dict(run_cfg), state=state, resume=resume
        )
        res["run_dir"] = run_dir
        res["run_cfg"] = run_cfg
        results.append(res)
        scheduler.observe(run_cfg, _sweep_objective(res, sweep))

        _post_fit_reports(model, res, train_ds, val_ds, task, run_dir)
    return results


def run_sweep_streaming(
    sweep: SweepConfig,
    train_sds,  # data.streaming.ShardedDataset
    val_ds: ArrayDataset,
    nband: int,
    sweep_dir: str,
    mesh=None,
    use_wandb: bool = False,
    max_runs: Optional[int] = None,
    epochs_override: Optional[int] = None,
    resume: bool = False,
):
    """The sweep loop over a SHARDED (>HBM) corpus: ``Trainer.fit_sharded``
    per grid point, shard-granular resume, completed runs skipped under
    ``resume``. The streaming counterpart of ``run_sweep`` for the sim
    pretraining path (the reference streams its HDF5 per item,
    src/dataloader.py:1037-1229; no folds — pretraining_clip_wandb.py uses
    a plain random split, which here is the ingest-time holdout). Post-fit
    reports are limited to the loss history: retrieval curves need the
    train embeddings, and the training corpus is deliberately not
    materialised.
    """
    extra = sweep.extra_args
    results = []
    scheduler = SweepScheduler(sweep, max_runs=max_runs)
    for k in range(scheduler.n_runs):
        run_cfg = scheduler.suggest()
        if run_cfg is None:
            break
        run_dir = os.path.join(sweep_dir, f"run-{k}")
        if resume:
            summary = completed_summary(run_dir)
            if summary is not None:
                res = _skipped_result(run_dir, run_cfg, summary)
                results.append(res)
                scheduler.observe(
                    run_cfg, _objective_from_summary(summary, sweep)
                )
                continue
        set_seed(int(run_cfg.get("seed", 0)))
        model, task, freeze, params_override, tcfg = _build_run(
            run_cfg, extra, nband, None, epochs_override
        )
        trainer = Trainer(
            model, task=task, cfg=tcfg, run_dir=run_dir, mesh=mesh,
            freeze=freeze, use_wandb=use_wandb,
            n_classes=int(extra.get("n_classes", 5)),
        )
        state = None
        if params_override is not None:
            trainer.set_dataset_size(len(train_sds))
            example = train_sds.load_shard(0).to_device().take(
                np.arange(tcfg.batch_size) % train_sds.shard_sizes[0]
            )
            state = trainer.init_state(example)
            state = state.replace(params=params_override(state.params))
        res = trainer.fit_sharded(
            train_sds, val_ds, config_dump=dict(run_cfg), state=state,
            resume=resume,
        )
        res["run_dir"] = run_dir
        res["run_cfg"] = run_cfg
        results.append(res)
        scheduler.observe(run_cfg, _sweep_objective(res, sweep))

        from ..evaluation.reports import plot_loss_history

        hist = res["history"]
        plot_loss_history(hist["train_loss"], hist["val_loss"], run_dir)
    return results


def _build_run(run_cfg, extra, nband, model_builder, epochs_override):
    """Model/task/freeze/surgery/trainer-config for one grid point (shared
    by the sequential loop and the parallel-folds path)."""
    if model_builder is not None:
        model, task, freeze, params_override = model_builder(
            run_cfg, extra, nband
        )
    else:
        model = CLIPModel(build_clip_config(run_cfg, extra, nband))
        task = task_of(extra)
        freeze, params_override = _default_pretrain_surgery(
            run_cfg, extra, model
        )
    tcfg = build_trainer_config(run_cfg, extra)
    if epochs_override is not None:
        tcfg.epochs = epochs_override
    return model, task, freeze, params_override, tcfg


def _run_sweep_parallel_folds(
    sweep: SweepConfig,
    dataset: ArrayDataset,
    nband: int,
    folds,
    sweep_dir: str,
    scheduler: SweepScheduler,
    model_builder: Optional[Callable] = None,
    mesh=None,
    epochs_override: Optional[int] = None,
    resume: bool = False,
    vary_keys: tuple = ("foldnumber",),
):
    """Grid points as vmapped member groups (training/ensemble.py).

    Grid points are grouped by their config minus ``vary_keys``; each
    group trains as ONE stacked program writing the same per-run
    directories (``run-<k>``) the sequential path would. The reference's
    flagship real-data recipe — 5 folds x batch 32, configs/config_grid
    .yaml foldnumber values [0..4] — becomes one program instead of five;
    with ``vary_keys=("foldnumber", "seed", "lr")`` a seed-ensemble or an
    lr sweep stacks the same way (per-member seeds/lrs ride in the stacked
    state — ensemble.set_member_lrs).
    """
    from .ensemble import Member, fit_members

    if sweep.method != "grid":
        raise ValueError(
            "parallel folds/members require method: grid (random/bayes "
            "schedules depend on sequential observations)"
        )
    extra = sweep.extra_args
    cfgs = []
    while True:
        c = scheduler.suggest()
        if c is None:
            break
        cfgs.append(c)

    groups: Dict[Any, list] = {}
    for k, run_cfg in enumerate(cfgs):
        key = tuple(
            sorted((kk, repr(v)) for kk, v in run_cfg.items()
                   if kk not in vary_keys)
        )
        groups.setdefault(key, []).append((k, run_cfg))

    indexed_results: Dict[int, Dict[str, Any]] = {}
    for gi, group in enumerate(groups.values()):
        if resume:
            summaries = {
                k: completed_summary(os.path.join(sweep_dir, f"run-{k}"))
                for k, _ in group
            }
            if all(s is not None for s in summaries.values()):
                # the whole stacked group already completed — skip it
                for k, rc in group:
                    indexed_results[k] = _skipped_result(
                        os.path.join(sweep_dir, f"run-{k}"), rc, summaries[k]
                    )
                continue
        run_cfg0 = group[0][1]
        model, task, freeze, params_override, tcfg = _build_run(
            run_cfg0, extra, nband, model_builder, epochs_override
        )
        set_seed(int(run_cfg0.get("seed", 0)))
        members = []
        for k, rc in group:
            # exactly the sequential path's split rule (fold indices when a
            # fold plan + foldnumber exist, else the seeded random split)
            inds_train, inds_val = split_for_run(
                len(dataset),
                float(extra.get("val_fraction", 0.2)),
                int(rc.get("seed", 0)),
                folds=folds,
                foldnumber=rc.get("foldnumber"),
            )
            members.append(
                Member(
                    name=f"run-{k}",
                    seed=int(rc.get("seed", 0)),
                    train_indices=inds_train,
                    val_indices=inds_val,
                    lr=float(rc["lr"]) if "lr" in rc else None,
                    config_dump=dict(rc),
                )
            )
        res_group = fit_members(
            model, task, tcfg, dataset, members,
            run_dir=sweep_dir, mesh=mesh,
            n_classes=int(extra.get("n_classes", 5)),
            freeze=freeze, params_override=params_override,
            resume=resume,
            ensemble_dir=os.path.join(sweep_dir, f"_ensemble-g{gi}"),
        )
        for (k, rc), m in zip(group, members):
            res = dict(res_group["members"][m.name])
            res["run_dir"] = os.path.join(sweep_dir, m.name)
            res["run_cfg"] = rc
            indexed_results[k] = res
            _post_fit_reports(
                model, res,
                dataset.subset(m.train_indices),
                dataset.subset(m.val_indices),
                task, res["run_dir"],
            )

    return [indexed_results[k] for k in sorted(indexed_results)]


def _sweep_objective(res: Dict[str, Any], sweep: SweepConfig) -> Optional[float]:
    """The sweep metric value a bayes scheduler optimizes: the reference's
    configs all target ``best_val_loss`` (configs/*.yaml metric.name); other
    names fall back to the trainer's monitored best."""
    name = (sweep.metric or {}).get("name", "best_val_loss")
    if name == "best_val_loss" and res["history"].get("val_loss"):
        return float(np.min(res["history"]["val_loss"]))
    best = res.get("best", {}).get("value")
    return None if best is None else float(best)


def _default_pretrain_surgery(run_cfg, extra, model):
    """The reference's pretrained-weight loading paths:
      * pretrain_lc_path (+ freeze_backbone_lc) — masked-pretrain encoder
        into the CLIP lightcurve encoder (script_wandb.py:184-185);
      * pretrain_path (+ freeze_backbone) — full CLIP non-strict load
        (finetune_clip.py:131-142).
    Returns (freeze predicate, params_override fn) — either may be None.
    """
    from .checkpoint import graft_masked_pretrain_into_clip, merge_params_nonstrict

    freeze = None
    override = None
    lc_path = extra.get("pretrain_lc_path")
    clip_path = extra.get("pretrain_path")
    if lc_path:
        if extra.get("freeze_backbone_lc"):
            freeze = freeze_encoder_except_projection("lightcurve_encoder")

        def override(params, path=lc_path):
            source = load_params(path, None)
            return graft_masked_pretrain_into_clip(params, source["params"])

    elif clip_path:
        if extra.get("freeze_backbone"):
            freeze = freeze_encoders_except_projection(
                ["lightcurve_encoder", "spectral_encoder"]
            )

        def override(params, path=clip_path):
            source = load_params(path, None)
            return merge_params_nonstrict(params, source["params"])

    return freeze, override


def _post_fit_reports(model, res, train_ds, val_ds, task, run_dir):
    """Loss history + retrieval curves (script_wandb.py:247-269)."""
    from ..evaluation.reports import plot_loss_history, plot_retrieval_curves

    hist = res["history"]
    plot_loss_history(hist["train_loss"], hist["val_loss"], run_dir)
    if task == "contrastive":
        from ..evaluation.embeddings import get_embeddings

        state = res["state"]
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        embs_train, names = get_embeddings(model, variables, train_ds)
        embs_val, _ = get_embeddings(model, variables, val_ds)
        plot_retrieval_curves(embs_train, embs_val, list(names), run_dir)
