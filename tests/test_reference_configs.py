"""The reference's own sweep-input YAMLs load unchanged (MIGRATION.md's
config-compatibility claim): same W&B sweep schema, same grid expansion,
and every point builds a model + trainer config here."""

import os

import pytest

from multimodal_supernovae_tpu.config.config import (
    build_clip_config,
    build_trainer_config,
    expand_grid,
    load_sweep,
)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "configs")),
    reason="reference tree not mounted",
)

# every sweep input the reference's entry scripts consume, with its
# expected grid size (configs/config.yaml is the per-run DUMP format,
# not a sweep input — covered by the factory run-dir tests instead)
SWEEP_YAMLS = [
    ("configs/config_grid.yaml", 5),
    ("configs/maven-lite.yaml", 5),
    ("configs/config_endtoend_clip.yaml", 5),
    ("pretrain_config/maven_pretrain_config.yaml", 1),
]


@needs_ref
@pytest.mark.parametrize("rel,n_points", SWEEP_YAMLS)
def test_reference_sweep_yaml_loads_unchanged(rel, n_points):
    sweep = load_sweep(os.path.join(REF, rel))
    points = list(expand_grid(sweep))
    assert len(points) == n_points
    for pt in points:
        clip_cfg = build_clip_config(pt, sweep.extra_args)
        tcfg = build_trainer_config(pt, sweep.extra_args)
        assert clip_cfg is not None and tcfg is not None


@needs_ref
def test_reference_grid_carries_its_lr_and_fold_axes():
    # config_grid.yaml's 5 points come from its foldnumber axis, and the
    # lr/f_mask keys our CLIs consume are present in every point
    sweep = load_sweep(os.path.join(REF, "configs", "config_grid.yaml"))
    points = list(expand_grid(sweep))
    folds = sorted(pt.get("foldnumber") for pt in points)
    assert folds == [0, 1, 2, 3, 4]
    assert all("lr" in pt for pt in points)


@needs_ref
@pytest.mark.parametrize("rel,n_points", SWEEP_YAMLS)
def test_reference_sweeps_preflight_clean(rel, n_points):
    """Stronger than loading: every grid point of the reference's own sweep
    YAMLs shape-checks a FULL train step here (jax.eval_shape preflight —
    the scripts' --check path)."""
    from multimodal_supernovae_tpu.training.preflight import preflight_sweep

    sweep = load_sweep(os.path.join(REF, rel))
    extra = sweep.extra_args
    reports, errors = preflight_sweep(
        sweep,
        nband=2,
        lc_len=2 * int(extra.get("max_lightcurve_data_len", 100)),
        sp_len=int(extra.get("max_spectral_data_len", 1000)),
    )
    assert errors == []
    assert len(reports) == n_points
    assert all(r["n_params"] > 0 for r in reports)
