"""Vmapped parallel training (training/ensemble.py): member-for-member
equality with sequential Trainer.fit runs, per-member learning rates, the
run-directory contract, and the sharded member axis.

No reference counterpart — the reference trains folds/sweep points
sequentially (script_wandb.py:339); these tests pin that our parallel
members are EXACTLY those sequential runs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
from multimodal_supernovae_tpu.training.checkpoint import CheckpointManager
from multimodal_supernovae_tpu.training.ensemble import (
    Member,
    build_member_lr_optimizer,
    fit_members,
    member_train_plan,
    member_val_plan,
    n_members,
    select_members,
    set_member_lrs,
    stack_states,
    unstack_member,
)
from multimodal_supernovae_tpu.training.optim import build_optimizer
from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def clip_model(**kw):
    cfg = CLIPConfig.create(
        combinations=kw.pop("combinations", ("lightcurve", "spectral")),
        enc_dim=8,
        nband=2,
        transformer_kwargs=SEQ,
        transformer_spectral_kwargs=SEQ,
        use_pallas=False,
        **kw,
    )
    return CLIPModel(cfg)


def two_fold_members(n=48, lr=None, seeds=(0, 0)):
    """Two equal-train-size members over one dataset (32 train / 16 val)."""
    idx = np.arange(n)
    m0 = Member("run-0", seeds[0], idx[:32], idx[32:], lr=lr)
    m1 = Member("run-1", seeds[1], np.concatenate([idx[:16], idx[32:]]),
                idx[16:32], lr=lr)
    return [m0, m1]


def sequential_fit(model, task, cfg, dataset, member, lr=None):
    c = TrainerConfig(**{**cfg.__dict__, "seed": member.seed,
                         **({"lr": lr} if lr is not None else {})})
    trainer = Trainer(model, task=task, cfg=c, run_dir=None)
    return trainer.fit(
        dataset.subset(member.train_indices),
        dataset.subset(member.val_indices),
    )


def assert_tree_close(a, b, atol=3e-4, rtol=1e-3):
    """Trained-parameter comparison. vmap batches every reduction, so CPU
    XLA tiles them differently than the unbatched program — the trajectories
    agree to float-reassociation accumulation, not bitwise."""
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, x), y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fit_members_matches_sequential_runs():
    """The core claim: each vmapped member's parameter trajectory, losses,
    metrics and early-stop bookkeeping equal a sequential Trainer.fit with
    that member's seed and split."""
    ds = make_synthetic_dataset(n=48, n_max_lc=10, n_max_sp=12, seed=0)
    members = two_fold_members(lr=None, seeds=(3, 7))
    cfg = TrainerConfig(epochs=3, batch_size=8, lr=3e-3, seed=0,
                        noise_level_mag=1.0)
    model = clip_model(loss="softmax", logit_scale_init=10.0)

    res = fit_members(model, "contrastive", cfg, ds, members)

    for m in members:
        seq = sequential_fit(model, "contrastive", cfg, ds, m)
        par = res["members"][m.name]
        np.testing.assert_allclose(
            par["history"]["train_loss"], seq["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            par["history"]["val_loss"], seq["history"]["val_loss"],
            atol=1e-5, rtol=1e-5)
        assert par["epochs_run"] == seq["epochs_run"]
        assert par["best"]["epoch"] == seq["best"]["epoch"]
        assert par["best"]["value"] == pytest.approx(
            seq["best"]["value"], abs=1e-5)
        for pr, sr in zip(par["metric_rows"], seq["metric_rows"]):
            assert pr["AUC_val"] == pytest.approx(sr["AUC_val"], abs=1e-4)
        assert_tree_close(par["state"].params, seq["state"].params)


def test_member_lrs_match_sequential_lr_runs():
    """An lr sweep as one stacked program: member i's trajectory equals a
    sequential run at that lr (RAdam is exactly linear in lr, so the
    stored-lr transform is bit-compatible with optax.radam(lr))."""
    ds = make_synthetic_dataset(n=32, n_max_lc=10, n_max_sp=12, seed=1)
    idx = np.arange(32)
    lrs = [3e-3, 3e-4]
    members = [
        Member(f"lr-{i}", 0, idx[:24], idx[24:], lr=lr)
        for i, lr in enumerate(lrs)
    ]
    cfg = TrainerConfig(epochs=2, batch_size=8, lr=1e-3, seed=0)
    model = clip_model(loss="softmax", logit_scale_init=10.0)

    res = fit_members(model, "contrastive", cfg, ds, members)
    for m, lr in zip(members, lrs):
        seq = sequential_fit(model, "contrastive", cfg, ds, m, lr=lr)
        par = res["members"][m.name]
        np.testing.assert_allclose(
            par["history"]["train_loss"], seq["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        assert_tree_close(par["state"].params, seq["state"].params)
    # the two lrs genuinely produced different models
    p0 = jax.tree_util.tree_leaves(res["members"]["lr-0"]["state"].params)
    p1 = jax.tree_util.tree_leaves(res["members"]["lr-1"]["state"].params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1)
    )


def test_member_lrs_with_steplr_match_sequential():
    """An lr sweep under a group-uniform StepLR schedule (the reference's
    masked-pretrain lr_scheduler_kwargs) as one stacked program: member i
    equals a sequential Trainer.fit at (lr_i, step_size, gamma). The
    staircase decay is member-independent, so it composes with the stored
    per-member lr (build_member_lr_optimizer)."""
    ds = make_synthetic_dataset(n=32, n_max_lc=10, n_max_sp=12, seed=2)
    idx = np.arange(32)
    lrs = [3e-3, 3e-4]
    members = [
        Member(f"lr-{i}", 0, idx[:24], idx[24:], lr=lr)
        for i, lr in enumerate(lrs)
    ]
    # step_size=1 epoch, gamma=0.5: the decay fires between every epoch,
    # so a schedule/step-count mismatch would break equality immediately
    cfg = TrainerConfig(epochs=3, batch_size=8, lr=1e-3, seed=0,
                        step_size=1, gamma=0.5)
    model = clip_model(loss="softmax", logit_scale_init=10.0)

    res = fit_members(model, "contrastive", cfg, ds, members)
    for m, lr in zip(members, lrs):
        seq = sequential_fit(model, "contrastive", cfg, ds, m, lr=lr)
        par = res["members"][m.name]
        np.testing.assert_allclose(
            par["history"]["train_loss"], seq["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        assert_tree_close(par["state"].params, seq["state"].params)


def test_member_lrs_with_freeze_match_sequential():
    """Varied per-member lr composed with a frozen backbone (the finetune
    recipe sweeping lr): member i equals a sequential frozen run at lr_i,
    and frozen leaves never move."""
    from multimodal_supernovae_tpu.training.optim import (
        freeze_encoder_except_projection,
    )

    ds = make_synthetic_dataset(n=32, n_max_lc=10, n_max_sp=12, seed=3)
    idx = np.arange(32)
    lrs = [3e-3, 1e-3]
    members = [
        Member(f"lr-{i}", 0, idx[:24], idx[24:], lr=lr)
        for i, lr in enumerate(lrs)
    ]
    cfg = TrainerConfig(epochs=2, batch_size=8, lr=5e-4, seed=0)
    model = clip_model(loss="softmax", logit_scale_init=10.0)
    freeze = freeze_encoder_except_projection("lightcurve_encoder")

    res = fit_members(model, "contrastive", cfg, ds, members, freeze=freeze)
    example = ds.host_batch(np.arange(8))
    init = model.init(jax.random.PRNGKey(0), example)["params"]
    for m, lr in zip(members, lrs):
        c = TrainerConfig(**{**cfg.__dict__, "seed": m.seed, "lr": lr})
        trainer = Trainer(model, task="contrastive", cfg=c, run_dir=None,
                          freeze=freeze)
        seq = trainer.fit(
            ds.subset(m.train_indices), ds.subset(m.val_indices)
        )
        par = res["members"][m.name]
        np.testing.assert_allclose(
            par["history"]["train_loss"], seq["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        assert_tree_close(par["state"].params, seq["state"].params)
        enc = par["state"].params["lightcurve_encoder"]
        np.testing.assert_allclose(
            np.asarray(enc["embedding_mag"]["kernel"]),
            np.asarray(init["lightcurve_encoder"]["embedding_mag"]["kernel"]),
            atol=1e-7,
        )


def test_member_lr_optimizer_equals_standard(rng):
    """Unit: build_member_lr_optimizer(lr) == build_optimizer(lr) updates."""
    params = {"w": jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(3,)).astype(np.float32))}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)),
        params,
    )
    for wd in (0.0, 0.01):
        tx_a = build_optimizer(lr=2e-3, weight_decay=wd)
        tx_b = build_member_lr_optimizer(lr=2e-3, weight_decay=wd)
        sa, sb = tx_a.init(params), tx_b.init(params)
        pa, pb = params, params
        for _ in range(5):
            ua, sa = tx_a.update(grads, sa, pa)
            ub, sb = tx_b.update(grads, sb, pb)
            pa = optax.apply_updates(pa, ua)
            pb = optax.apply_updates(pb, ub)
        assert_tree_close(pa, pb, atol=1e-7, rtol=1e-7)


def test_set_member_lrs_requires_member_lr_state():
    params = {"w": jnp.ones((2,))}
    tx = build_optimizer(lr=1e-3)
    from multimodal_supernovae_tpu.training.state import TrainState

    st = TrainState.create(apply_fn=None, params=params, tx=tx)
    stacked = stack_states([st, st])
    with pytest.raises(ValueError, match="member_lr"):
        set_member_lrs(stacked, [1e-3, 1e-4])

    tx2 = build_member_lr_optimizer(lr=1e-3)
    st2 = TrainState.create(apply_fn=None, params=params, tx=tx2)
    stacked2 = stack_states([st2, st2])
    out = set_member_lrs(stacked2, [1e-3, 1e-4])
    assert n_members(out) == 2


def test_stack_unstack_select_roundtrip():
    from multimodal_supernovae_tpu.training.state import TrainState

    tx = build_optimizer(lr=1e-3)
    sts = [
        TrainState.create(
            apply_fn=None, params={"w": jnp.full((3,), float(i))}, tx=tx
        )
        for i in range(4)
    ]
    stacked = stack_states(sts)
    assert n_members(stacked) == 4
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(unstack_member(stacked, i).params["w"]),
            np.asarray(sts[i].params["w"]),
        )
    mask = jnp.asarray([True, False, True, False])
    doubled = jax.tree_util.tree_map(lambda x: x * 2, stacked)
    sel = select_members(mask, doubled, stacked)
    got = np.asarray(sel.params["w"])
    np.testing.assert_array_equal(got[0], 0.0)
    np.testing.assert_array_equal(got[1], 1.0)
    np.testing.assert_array_equal(got[2], 4.0)
    np.testing.assert_array_equal(got[3], 3.0)


def test_member_plans_respect_membership_and_padding():
    rng = np.random.default_rng(0)
    m = Member("m", 0, np.arange(10, 30), np.arange(0, 7))
    plan = member_train_plan(m, batch_size=8, rng=rng, steps=5)
    assert plan.shape == (5, 8)
    assert set(plan.ravel()) <= set(range(10, 30))
    # wrap-extension keeps visiting the member's own permutation
    assert set(plan[:3].ravel()) == set(range(10, 30))

    vplan = member_val_plan(m, batch_size=8, steps=3)
    assert vplan.shape == (3, 8)
    assert set(vplan.ravel()) <= set(range(0, 7))
    # step-padding repeats the last REAL row (trimmed on host by n_val)
    assert (vplan[1] == vplan[0]).all() and (vplan[2] == vplan[0]).all()


def test_fit_members_run_dir_contract(tmp_path):
    """Each member's directory carries the reference run contract: config,
    split manifests, metrics.jsonl, summary, best/last checkpoints whose
    params equal the in-memory best/final states."""
    ds = make_synthetic_dataset(n=48, n_max_lc=10, n_max_sp=12, seed=2)
    members = two_fold_members(seeds=(0, 1))
    cfg = TrainerConfig(epochs=3, batch_size=8, lr=3e-3, seed=0)
    model = clip_model(loss="softmax", logit_scale_init=10.0)
    res = fit_members(
        model, "contrastive", cfg, ds, members, run_dir=str(tmp_path)
    )
    for m in members:
        mdir = tmp_path / m.name
        assert (mdir / "config.yaml").exists()
        assert (mdir / "metrics.jsonl").exists()
        assert (mdir / "summary.json").exists()
        names = [l.strip() for l in open(mdir / "val_filenames.txt")]
        assert names == [ds.filenames[i] for i in m.val_indices]
        par = res["members"][m.name]
        assert par["best_ckpt_epoch"] == par["best"]["epoch"]
        # restore best ckpt -> equals the device-side best snapshot
        monitor_mode = ("val_loss", "min")
        ck = CheckpointManager(str(mdir), *monitor_mode, 2)
        template = unstack_member(res["states"], 0)
        restored = ck.restore(template, which="best")
        best_i = [i for i, mm in enumerate(members) if mm.name == m.name][0]
        assert_tree_close(
            restored.params,
            unstack_member(res["best_states"], best_i).params,
            atol=0, rtol=0,
        )
        ck.close()


def test_fit_members_early_stop_bookkeeping():
    ds = make_synthetic_dataset(n=32, n_max_lc=10, n_max_sp=12, seed=3)
    members = two_fold_members(n=32, seeds=(0, 5))
    for m in members:
        m.train_indices = np.arange(24)
        m.val_indices = np.arange(24, 32)
    cfg = TrainerConfig(epochs=14, batch_size=8, lr=1e-2, seed=0, patience=1)
    model = clip_model(loss="softmax", logit_scale_init=10.0)
    res = fit_members(model, "contrastive", cfg, ds, members)
    for m in members:
        par = res["members"][m.name]
        assert par["epochs_run"] <= cfg.epochs
        assert len(par["metric_rows"]) == par["epochs_run"]
        seq = sequential_fit(model, "contrastive", cfg, ds, m)
        assert par["epochs_run"] == seq["epochs_run"]
        assert par["best"]["epoch"] == seq["best"]["epoch"]
        # an early-stopped member's final state is its state AT the stop
        # epoch — the stacked program's extra epochs must not leak in
        assert_tree_close(par["state"].params, seq["state"].params)
    # the members genuinely stopped at different epochs (else the snapshot
    # path was never exercised)
    runs = [res["members"][m.name]["epochs_run"] for m in members]
    assert len(set(runs)) > 1 or runs[0] < cfg.epochs


def test_fit_members_sharded_member_axis():
    """The member axis shards over the mesh's data axis — embarrassingly
    parallel, and numerically identical to the unsharded ensemble."""
    from multimodal_supernovae_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])

    ds = make_synthetic_dataset(n=32, n_max_lc=10, n_max_sp=12, seed=4)
    idx = np.arange(32)
    members = [
        Member(f"run-{i}", i, np.roll(idx, 8 * i)[:24],
               np.roll(idx, 8 * i)[24:])
        for i in range(4)
    ]
    cfg = TrainerConfig(epochs=2, batch_size=8, lr=3e-3, seed=0)
    model = clip_model(loss="softmax", logit_scale_init=10.0)

    res_plain = fit_members(model, "contrastive", cfg, ds,
                            [dataclass_copy(m) for m in members])
    res_mesh = fit_members(model, "contrastive", cfg, ds, members, mesh=mesh)
    for m in members:
        a = res_plain["members"][m.name]
        b = res_mesh["members"][m.name]
        np.testing.assert_allclose(
            a["history"]["train_loss"], b["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        assert_tree_close(a["state"].params, b["state"].params)


def test_fit_members_freeze_matches_sequential():
    """The finetune recipe's frozen-backbone optimizer inside the stacked
    program: member trajectories equal sequential frozen Trainer runs, and
    frozen leaves never move from each member's own init."""
    from multimodal_supernovae_tpu.training.optim import (
        freeze_encoder_except_projection,
    )

    ds = make_synthetic_dataset(n=48, n_max_lc=10, n_max_sp=12, seed=5)
    members = two_fold_members(seeds=(0, 1))
    cfg = TrainerConfig(epochs=2, batch_size=8, lr=3e-3, seed=0)
    model = clip_model(loss="softmax", logit_scale_init=10.0)
    freeze = freeze_encoder_except_projection("lightcurve_encoder")

    res = fit_members(
        model, "contrastive", cfg, ds, members, freeze=freeze
    )
    example = ds.host_batch(np.arange(8))
    for m in members:
        c = TrainerConfig(**{**cfg.__dict__, "seed": m.seed})
        trainer = Trainer(model, task="contrastive", cfg=c, run_dir=None,
                          freeze=freeze)
        seq = trainer.fit(
            ds.subset(m.train_indices), ds.subset(m.val_indices)
        )
        par = res["members"][m.name]
        np.testing.assert_allclose(
            par["history"]["train_loss"], seq["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        assert_tree_close(par["state"].params, seq["state"].params)
        # frozen leaves stay at this member's OWN init; projection moves
        init = model.init(jax.random.PRNGKey(m.seed), example)["params"]
        enc = par["state"].params["lightcurve_encoder"]
        np.testing.assert_allclose(
            np.asarray(enc["embedding_mag"]["kernel"]),
            np.asarray(
                init["lightcurve_encoder"]["embedding_mag"]["kernel"]
            ),
            atol=1e-7,
        )
        assert not np.allclose(
            np.asarray(enc["projection"]["kernel"]),
            np.asarray(init["lightcurve_encoder"]["projection"]["kernel"]),
            atol=1e-7,
        )


def dataclass_copy(m: Member) -> Member:
    return Member(m.name, m.seed, np.array(m.train_indices),
                  np.array(m.val_indices), m.lr, m.config_dump)


# -- sweep-level parallel folds -------------------------------------------------


def _fold_sweep_yaml(tmp_path, kfolds=3):
    import yaml as _yaml

    with open(os.path.join(os.path.dirname(__file__), "..", "configs",
                           "smoke.yaml")) as f:
        raw = _yaml.safe_load(f)
    raw["parameters"]["foldnumber"] = {"values": list(range(kfolds))}
    raw["extra_args"]["kfolds"] = kfolds
    path = tmp_path / "fold_sweep.yaml"
    with open(path, "w") as f:
        _yaml.safe_dump(raw, f)
    return str(path)


def test_run_sweep_parallel_folds_matches_sequential(tmp_path):
    """scripts/train.py --parallel-folds: grid points differing only in
    foldnumber train as one vmapped program, writing the SAME run-dir
    contract and per-fold results the sequential sweep produces."""
    import yaml as _yaml

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.folds import stratified_kfolds
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    sweep = load_sweep(_fold_sweep_yaml(tmp_path, kfolds=3))
    ds = make_synthetic_dataset(n=42, n_max_lc=8, nband=2, n_max_sp=64,
                                seed=0)
    folds = stratified_kfolds(ds.arrays["label"], 3)

    par_dir = make_sweep_dir(sweep, str(tmp_path), "par")
    seq_dir = make_sweep_dir(sweep, str(tmp_path), "seq")
    par = run_sweep(sweep, ds, nband=2, folds=folds, sweep_dir=par_dir,
                    parallel_folds=True)
    seq = run_sweep(sweep, ds, nband=2, folds=folds, sweep_dir=seq_dir)

    assert len(par) == len(seq) == 3
    for p, s in zip(par, seq):
        # every field scripts/train.py's results print reads must exist
        for k in ("run_dir", "best", "epochs_run", "wall_time_s"):
            assert k in p, k
        assert p["run_cfg"]["foldnumber"] == s["run_cfg"]["foldnumber"]
        assert os.path.basename(p["run_dir"]) == os.path.basename(s["run_dir"])
        np.testing.assert_allclose(
            p["history"]["train_loss"], s["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        assert p["best"]["epoch"] == s["best"]["epoch"]
        # run-dir contract identical to the sequential path
        for fname in ("config.yaml", "train_filenames.txt",
                      "val_filenames.txt", "metrics.jsonl", "summary.json",
                      "loss_history.png", "ROC_curves.png"):
            assert os.path.exists(os.path.join(p["run_dir"], fname)), fname
        with open(os.path.join(p["run_dir"], "config.yaml")) as f:
            cfg = _yaml.safe_load(f)
        assert cfg["foldnumber"] == p["run_cfg"]["foldnumber"]
        for fname in ("train_filenames.txt", "val_filenames.txt"):
            a = open(os.path.join(p["run_dir"], fname)).read()
            b = open(os.path.join(s["run_dir"], fname)).read()
            assert a == b, fname


def test_run_sweep_parallel_folds_reload(tmp_path):
    """A parallel-fold run dir reloads through the standard factory path."""
    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.data.folds import stratified_kfolds
    from multimodal_supernovae_tpu.models.factory import load_model
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    sweep = load_sweep(_fold_sweep_yaml(tmp_path, kfolds=2))
    ds = make_synthetic_dataset(n=32, n_max_lc=8, nband=2, n_max_sp=64,
                                seed=1)
    folds = stratified_kfolds(ds.arrays["label"], 2)
    sweep_dir = make_sweep_dir(sweep, str(tmp_path), "parload")
    results = run_sweep(sweep, ds, nband=2, folds=folds, sweep_dir=sweep_dir,
                        parallel_folds=True)
    run_dir = results[0]["run_dir"]
    example = ds.host_batch(np.arange(4))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        run_dir, example
    )
    assert sorted(train_names + val_names) == sorted(ds.filenames)
    from multimodal_supernovae_tpu.evaluation.embeddings import get_embeddings

    embs, names = get_embeddings(
        model, variables, ds.subset_by_filenames(val_names), batch_size=8
    )
    assert names == ["lightcurve", "spectral"]


def test_run_sweep_parallel_members_matches_sequential(tmp_path):
    """scripts/train.py --parallel-members: grid points differing in seed
    AND lr (the reference's config_grid.yaml lr list) stack as one vmapped
    program — per-member seeds drive distinct inits/splits/shuffles, the lr
    rides in the stacked optimizer state (VERDICT r3 item 5)."""
    import yaml as _yaml

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    with open(os.path.join(os.path.dirname(__file__), "..", "configs",
                           "smoke.yaml")) as f:
        raw = _yaml.safe_load(f)
    raw["parameters"]["lr"] = {"values": [0.003, 0.001]}
    raw["parameters"]["seed"] = {"values": [0, 1]}
    path = tmp_path / "member_sweep.yaml"
    with open(path, "w") as f:
        _yaml.safe_dump(raw, f)
    sweep = load_sweep(str(path))
    ds = make_synthetic_dataset(n=40, n_max_lc=8, nband=2, n_max_sp=64,
                                seed=3)

    par_dir = make_sweep_dir(sweep, str(tmp_path), "par")
    seq_dir = make_sweep_dir(sweep, str(tmp_path), "seq")
    par = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=par_dir,
                    parallel_members=True)
    seq = run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=seq_dir)

    assert len(par) == len(seq) == 4
    assert len({(r["run_cfg"]["seed"], r["run_cfg"]["lr"]) for r in par}) == 4
    for p, s in zip(par, seq):
        assert (p["run_cfg"]["seed"], p["run_cfg"]["lr"]) == (
            s["run_cfg"]["seed"], s["run_cfg"]["lr"])
        np.testing.assert_allclose(
            p["history"]["train_loss"], s["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            p["history"]["val_loss"], s["history"]["val_loss"],
            atol=1e-5, rtol=1e-5)
        assert p["best"]["epoch"] == s["best"]["epoch"]
        assert_tree_close(p["state"].params, s["state"].params)
        # split manifests follow each member's own seed
        for fname in ("train_filenames.txt", "val_filenames.txt"):
            a = open(os.path.join(p["run_dir"], fname)).read()
            b = open(os.path.join(s["run_dir"], fname)).read()
            assert a == b, fname


def test_run_sweep_parallel_folds_requires_grid(tmp_path):
    import yaml as _yaml

    from multimodal_supernovae_tpu.config import load_sweep
    from multimodal_supernovae_tpu.training.experiment import (
        make_sweep_dir,
        run_sweep,
    )

    path = _fold_sweep_yaml(tmp_path, kfolds=2)
    with open(path) as f:
        raw = _yaml.safe_load(f)
    raw["method"] = "random"
    with open(path, "w") as f:
        _yaml.safe_dump(raw, f)
    sweep = load_sweep(path)
    ds = make_synthetic_dataset(n=24, n_max_lc=8, nband=2, n_max_sp=64,
                                seed=2)
    sweep_dir = make_sweep_dir(sweep, str(tmp_path), "guard")
    with pytest.raises(ValueError, match="grid"):
        run_sweep(sweep, ds, nband=2, folds=None, sweep_dir=sweep_dir,
                  parallel_folds=True)


def test_fit_members_resume_continues_identically(tmp_path):
    """Preemption-safe resume: 2 epochs + resume to 4 == straight 4 epochs
    (states, histories, metrics), via the per-epoch ensemble checkpoint."""
    import dataclasses as dc

    ds = make_synthetic_dataset(n=48, n_max_lc=10, n_max_sp=12, seed=6)
    model = clip_model(loss="softmax", logit_scale_init=10.0)
    cfg4 = TrainerConfig(epochs=4, batch_size=8, lr=3e-3, seed=0,
                         noise_level_mag=1.0)

    full = fit_members(
        model, "contrastive", cfg4, ds,
        two_fold_members(seeds=(3, 7)), run_dir=str(tmp_path / "full")
    )

    rdir = str(tmp_path / "resumed")
    cfg2 = dc.replace(cfg4, epochs=2)
    fit_members(model, "contrastive", cfg2, ds,
                two_fold_members(seeds=(3, 7)), run_dir=rdir)
    res = fit_members(model, "contrastive", cfg4, ds,
                      two_fold_members(seeds=(3, 7)), run_dir=rdir,
                      resume=True)

    for m in two_fold_members(seeds=(3, 7)):
        a, b = full["members"][m.name], res["members"][m.name]
        np.testing.assert_allclose(
            a["history"]["train_loss"], b["history"]["train_loss"],
            atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            a["history"]["val_loss"], b["history"]["val_loss"],
            atol=1e-5, rtol=1e-5)
        assert a["best"]["epoch"] == b["best"]["epoch"]
        assert a["epochs_run"] == b["epochs_run"]
        assert_tree_close(a["state"].params, b["state"].params)

    # resuming an already-complete run trains nothing and reproduces results
    res2 = fit_members(model, "contrastive", cfg4, ds,
                       two_fold_members(seeds=(3, 7)), run_dir=rdir,
                       resume=True)
    for m in two_fold_members(seeds=(3, 7)):
        assert (res2["members"][m.name]["epochs_run"]
                == full["members"][m.name]["epochs_run"])
        assert_tree_close(
            res2["members"][m.name]["state"].params,
            res["members"][m.name]["state"].params, atol=0, rtol=0)


def test_fit_members_resume_rejects_member_mismatch(tmp_path):
    ds = make_synthetic_dataset(n=48, n_max_lc=10, n_max_sp=12, seed=7)
    model = clip_model(loss="softmax", logit_scale_init=10.0)
    cfg = TrainerConfig(epochs=1, batch_size=8, lr=3e-3, seed=0)
    rdir = str(tmp_path)
    fit_members(model, "contrastive", cfg, ds,
                two_fold_members(seeds=(0, 1)), run_dir=rdir)
    bad = two_fold_members(seeds=(0, 1))
    bad[1] = Member("other-name", 1, bad[1].train_indices,
                    bad[1].val_indices)
    with pytest.raises(RuntimeError, match="member mismatch"):
        fit_members(model, "contrastive", cfg, ds, bad, run_dir=rdir,
                    resume=True)
