"""End-to-end tests of the experiment layer: sweep running, run-dir
contract, model factory reload, finetune/masked builders, probe-based
evaluation — all on synthetic data."""

import os

import numpy as np
import pytest
import yaml

from multimodal_supernovae_tpu.config import load_sweep, expand_grid
from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.training.experiment import (
    make_sweep_dir,
    run_sweep,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
SMOKE = os.path.join(REPO, "configs", "smoke.yaml")


@pytest.fixture(scope="module")
def sweep_results(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    sweep = load_sweep(SMOKE)
    sweep_dir = make_sweep_dir(sweep, str(root), "smoke")
    ds = make_synthetic_dataset(n=40, n_max_lc=8, nband=2, n_max_sp=64, seed=0)
    results = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sweep_dir)
    return sweep, sweep_dir, ds, results


def test_sweep_yaml_roundtrip():
    sweep = load_sweep(SMOKE)
    points = list(expand_grid(sweep))
    assert len(points) == sweep.n_points == 1
    assert points[0]["emb"] == 8
    assert sweep.extra_args["combinations"] == ["lightcurve", "spectral"]


def test_run_dir_contract(sweep_results):
    sweep, sweep_dir, ds, results = sweep_results
    assert len(results) == 1
    run_dir = results[0]["run_dir"]
    assert os.path.exists(os.path.join(sweep_dir, "sweep_config.yaml"))
    for fname in ("config.yaml", "train_filenames.txt", "val_filenames.txt",
                  "metrics.jsonl", "summary.json", "loss_history.png",
                  "ROC_curves.png"):
        assert os.path.exists(os.path.join(run_dir, fname)), fname
    with open(os.path.join(run_dir, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["emb"] == 8


def test_factory_reload_and_embedding_consistency(sweep_results):
    """load_model must rebuild the exact architecture + weights: embeddings
    recomputed after reload must match the in-memory post-fit model."""
    from multimodal_supernovae_tpu.evaluation.embeddings import get_embeddings
    from multimodal_supernovae_tpu.models.factory import load_model

    sweep, sweep_dir, ds, results = sweep_results
    run_dir = results[0]["run_dir"]
    example = ds.host_batch(np.arange(4))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        run_dir, example
    )
    assert sorted(train_names + val_names) == sorted(ds.filenames)
    val_ds = ds.subset_by_filenames(val_names)
    embs, names = get_embeddings(model, variables, val_ds, batch_size=8)
    assert names == ["lightcurve", "spectral"]
    assert embs[0].shape == (len(val_ds), 8)
    np.testing.assert_allclose(np.linalg.norm(embs[0], axis=1), 1.0, rtol=1e-5)
    # reload != random init: embeddings of a fresh init differ
    import jax

    fresh = model.init(jax.random.PRNGKey(7), example)
    embs_fresh, _ = get_embeddings(model, fresh, val_ds, batch_size=8)
    assert not np.allclose(embs[0], embs_fresh[0], atol=1e-3)


def test_finetune_builder_continues_from_pretrained(sweep_results, tmp_path):
    from multimodal_supernovae_tpu.models.factory import finetune_model_builder

    sweep, sweep_dir, ds, results = sweep_results
    pretrain_dir = results[0]["run_dir"]
    extra = dict(sweep.extra_args, pretrain_path=pretrain_dir,
                 freeze_backbone=True)
    ft_sweep = load_sweep(SMOKE)
    ft_sweep.extra_args = extra
    ft_dir = make_sweep_dir(ft_sweep, str(tmp_path), "ft")
    results_ft = run_sweep(
        ft_sweep, ds, nband=2, folds=None, sweep_dir=ft_dir,
        model_builder=finetune_model_builder(extra), epochs_override=2,
    )
    assert np.isfinite(results_ft[0]["history"]["train_loss"][-1])
    # frozen backbone: encoder params (except projection) must not move
    from multimodal_supernovae_tpu.models.factory import load_model

    example = ds.host_batch(np.arange(4))
    _, pre_vars, *_ = load_model(pretrain_dir, example)
    post = results_ft[0]["state"].params
    pre_k = pre_vars["params"]["lightcurve_encoder"]["embedding_mag"]["kernel"]
    post_k = post["lightcurve_encoder"]["embedding_mag"]["kernel"]
    np.testing.assert_allclose(np.asarray(post_k), np.asarray(pre_k), atol=1e-7)
    # but the (unfrozen) projection does move
    pre_p = pre_vars["params"]["lightcurve_encoder"]["projection"]["kernel"]
    post_p = post["lightcurve_encoder"]["projection"]["kernel"]
    assert not np.allclose(np.asarray(post_p), np.asarray(pre_p), atol=1e-7)


def test_finetune_builder_regression_head(sweep_results, tmp_path):
    from multimodal_supernovae_tpu.models.factory import finetune_model_builder

    sweep, sweep_dir, ds, results = sweep_results
    extra = dict(sweep.extra_args, pretrain_path=results[0]["run_dir"],
                 regression=True, freeze_backbone=True)
    ft_sweep = load_sweep(SMOKE)
    ft_sweep.extra_args = extra
    ft_sweep.raw["extra_args"] = extra
    ft_dir = make_sweep_dir(ft_sweep, str(tmp_path), "ftreg")
    results_ft = run_sweep(
        ft_sweep, ds, nband=2, folds=None, sweep_dir=ft_dir,
        model_builder=finetune_model_builder(extra), epochs_override=2,
    )
    assert "R2_val" in results_ft[0]["metric_rows"][-1]

    # the run dir reloads as a ClipMLPHead and predicts (evaluate.py's
    # supervised path)
    from multimodal_supernovae_tpu.evaluation.embeddings import predict_supervised
    from multimodal_supernovae_tpu.models.clip_mlp import ClipMLPHead
    from multimodal_supernovae_tpu.models.factory import load_model

    example = ds.host_batch(np.arange(4))
    model, variables, *_ = load_model(results_ft[0]["run_dir"], example)
    assert isinstance(model, ClipMLPHead)
    assert model.cfg.supervised
    preds = predict_supervised(model, variables, ds.subset(np.arange(8)))
    assert preds.shape == (8, 1) and np.isfinite(preds).all()


def test_masked_builder(tmp_path):
    from multimodal_supernovae_tpu.models.factory import masked_model_builder

    sweep = load_sweep(SMOKE)
    sweep.parameters["f_mask"] = [0.3]
    ds = make_synthetic_dataset(n=32, n_max_lc=8, nband=2, seed=1,
                                modalities=("lightcurve",))
    mdir = make_sweep_dir(sweep, str(tmp_path), "masked")
    results = run_sweep(
        sweep, ds, nband=2, folds=None, sweep_dir=mdir,
        model_builder=masked_model_builder(sweep.extra_args),
        epochs_override=3,
    )
    h = results[0]["history"]["train_loss"]
    assert np.isfinite(h[-1])


def test_evaluate_supervised_run(tmp_path):
    """evaluate_run scores supervised runs on their own head predictions."""
    from multimodal_supernovae_tpu.cli import evaluate

    sweep = load_sweep(SMOKE)
    sweep.extra_args = dict(sweep.extra_args, regression=True,
                            combinations=["lightcurve"])
    sweep.raw["extra_args"] = sweep.extra_args  # persists to sweep_config.yaml
    ds = make_synthetic_dataset(n=32, n_max_lc=8, seed=7,
                                modalities=("lightcurve",))
    sdir = make_sweep_dir(sweep, str(tmp_path), "reg")
    results = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sdir,
                        epochs_override=2)
    out = {"regression": [], "classification": [],
           "regression_results": [], "classification_results": []}
    evaluate.evaluate_run(results[0]["run_dir"], "lc-reg", 0, ds, out)
    assert len(out["regression"]) == 1
    assert out["regression"][0]["Model"] == "lc-reg"
    assert np.isfinite(out["regression"][0]["R2"])
    assert out["classification"] == []


def test_evaluate_run_probes(sweep_results, tmp_path):
    """The evaluate driver's probe core over a finished run."""
    from multimodal_supernovae_tpu.cli import evaluate

    sweep, sweep_dir, ds, results = sweep_results
    out = {"regression": [], "classification": [],
           "regression_results": [], "classification_results": []}
    evaluate.evaluate_run(results[0]["run_dir"], "smoke", 0, ds, out)
    assert len(out["regression"]) > 0
    combos = {m["Combination"] for m in out["regression"]}
    assert {"lightcurve", "spectral", "lightcurve+spectral"} <= combos
    models = {m["Model"] for m in out["regression"]}
    assert "smoke+Linear" in models and "smoke+KNN5" in models
    for m in out["regression"]:
        assert np.isfinite(m["R2"])
    # LaTeX reporting runs
    from multimodal_supernovae_tpu.evaluation.reports import metrics_to_latex

    tables = metrics_to_latex(out["regression"], sort="R2")
    assert any("R2" in t for t in tables)
