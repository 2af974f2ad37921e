import numpy as np
import pytest

from multimodal_supernovae_tpu.config import (
    SweepConfig,
    build_clip_config,
    expand_grid,
)


def test_grid_expansion_order():
    sweep = SweepConfig(parameters={"a": [1, 2], "b": ["x"]}, extra_args={})
    points = list(expand_grid(sweep))
    assert points == [{"a": 1, "b": "x"}, {"a": 2, "b": "x"}]
    assert sweep.n_points == 2


def test_random_expansion():
    sweep = SweepConfig(
        parameters={"a": [1, 2, 3], "b": [10, 20]},
        extra_args={"nruns": 7, "sweep_seed": 1},
        method="random",
    )
    points = list(expand_grid(sweep))
    assert len(points) == 7
    for p in points:
        assert p["a"] in (1, 2, 3) and p["b"] in (10, 20)
    # deterministic under the seed
    assert points == list(expand_grid(sweep))


def test_build_clip_config_spectral_fallbacks():
    run_cfg = {"n_out": 16, "emb": 32, "heads": 4, "transformer_depth": 3,
               "dropout": 0.1, "time_norm": 500.0, "agg": "max"}
    cfg = build_clip_config(run_cfg, {"combinations": ["lightcurve", "spectral"]})
    tsk = dict(cfg.transformer_spectral_kwargs)
    # spectral falls back to the lightcurve hyperparameters
    assert tsk["emb"] == 32 and tsk["heads"] == 4 and tsk["depth"] == 3
    assert cfg.enc_dim == 128  # the reference's constructor default
    assert cfg.combinations == ("lightcurve", "spectral")


def test_nan_failure_detection():
    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=seq,
        transformer_spectral_kwargs=seq, use_pallas=False,
    )
    ds = make_synthetic_dataset(n=16, n_max_lc=8, n_max_sp=8, seed=0)
    arrays = dict(ds.arrays)
    arrays["x_lc"] = arrays["x_lc"].copy()
    arrays["x_lc"][0, 0] = np.nan  # poisoned sample -> NaN loss
    from multimodal_supernovae_tpu.data.batching import ArrayDataset

    bad = ArrayDataset(arrays, ds.filenames)
    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=3, batch_size=16, lr=1e-3, seed=0),
        run_dir=None,
    )
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.fit(bad.subset(np.arange(12)), bad.subset(np.arange(12, 16)))


def test_steplr_decays_per_epoch_not_per_step():
    """Regression: StepLR must convert epoch step_size to optimizer steps
    (a step_size=2 schedule with 4 steps/epoch decays at step 8, not 2)."""
    import optax

    from multimodal_supernovae_tpu.training.optim import build_optimizer

    import jax.numpy as jnp

    params = {"w": jnp.ones(3)}
    tx = build_optimizer(lr=1.0, step_size=2, gamma=0.1, steps_per_epoch=4)
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    deltas = []
    p = params
    for _ in range(10):
        updates, state = tx.update(grads, state, p)
        deltas.append(float(jnp.abs(updates["w"][0])))
        p = optax.apply_updates(p, updates)
    # radam warmup: early steps are SGD-like; what matters is the decay
    # boundary at step 8 (= 2 epochs x 4 steps), not step 2
    assert deltas[2] > 0.01  # no decay after 2 optimizer steps
    assert deltas[8] < deltas[7] * 0.5  # decay kicks in at 2 epochs


def test_bayes_search_finds_optimum_region():
    """TPE-lite bayes: on a separable quadratic objective over a 10x10 grid,
    30 suggestions locate the optimum region far better than the startup
    phase alone, all suggestions are unique, and exhaustion returns None."""
    from multimodal_supernovae_tpu.config.config import BayesSearch, SweepConfig

    sweep = SweepConfig(
        parameters={"a": list(range(10)), "b": list(range(10))},
        extra_args={"sweep_seed": 0},
        method="bayes",
        metric={"name": "best_val_loss", "goal": "minimize"},
    )
    search = BayesSearch(sweep, n_startup=5)
    seen, best = set(), float("inf")
    for _ in range(30):
        cfg = search.suggest()
        assert cfg is not None
        key = (cfg["a"], cfg["b"])
        assert key not in seen
        seen.add(key)
        val = (cfg["a"] - 3) ** 2 + (cfg["b"] - 7) ** 2
        best = min(best, val)
        search.observe(cfg, val)
    assert best <= 2, f"bayes failed to localize the optimum (best={best})"
    # exhaustion: after all 100 points, suggest() returns None
    while search.suggest() is not None:
        pass
    assert search.suggest() is None


def test_bayes_maximize_goal():
    from multimodal_supernovae_tpu.config.config import BayesSearch, SweepConfig

    sweep = SweepConfig(
        parameters={"a": list(range(8))},
        extra_args={},
        method="bayes",
        metric={"name": "best_auc", "goal": "maximize"},
    )
    search = BayesSearch(sweep, n_startup=3)
    best = -1
    for _ in range(8):
        cfg = search.suggest()
        if cfg is None:
            break
        val = -abs(cfg["a"] - 6)  # maximum at a=6
        best = max(best, val)
        search.observe(cfg, val)
    assert best == 0


def test_sweep_scheduler_budgets():
    from multimodal_supernovae_tpu.config.config import SweepConfig, SweepScheduler

    grid = SweepConfig(parameters={"a": [1, 2], "b": [3, 4]}, extra_args={})
    s = SweepScheduler(grid)
    assert s.n_runs == 4
    cfgs = [s.suggest() for _ in range(5)]
    assert cfgs[-1] is None and all(c is not None for c in cfgs[:4])

    bayes = SweepConfig(parameters={"a": [1, 2], "b": [3, 4]},
                        extra_args={"nruns": 3}, method="bayes")
    s = SweepScheduler(bayes)
    assert s.n_runs == 3
    out = []
    while True:
        c = s.suggest()
        if c is None:
            break
        out.append(c)
        s.observe(c, 0.0)
    assert len(out) == 3
