"""Streaming/sharded ingest: a corpus must be trainable without ever being
materialised as one array — sharded cache contents equal the monolithic
ingest exactly, and Trainer.fit_sharded trains over shards with the same
loss semantics (one shard HBM-resident at a time; data/streaming.py)."""

import os

import numpy as np
import pytest

from multimodal_supernovae_tpu.data.simulation import (
    ingest_simulation,
    iter_simulation_chunks,
    stream_simulation_to_cache,
)
from multimodal_supernovae_tpu.data.streaming import (
    ShardedDataset,
    shard_epoch_schedule,
    write_sharded_cache,
)

from fixtures import write_mini_sim_hdf5

KW = dict(bands=("r",), n_max_obs=12, n_max_obs_spec=16,
          combinations=("lightcurve", "spectral"), noise=True, seed=0)


@pytest.fixture(scope="module")
def h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sim") / "sim.h5")
    return write_mini_sim_hdf5(path, n_per_type=8)


def test_sharded_cache_matches_monolithic(h5, tmp_path):
    full = ingest_simulation(h5, **KW)
    sds = stream_simulation_to_cache(h5, str(tmp_path / "s"), rows_per_shard=5,
                                     **KW)
    assert len(sds) == len(full)
    # 16 rows at 5/shard -> 5,5,5,1
    assert sds.shard_sizes == [5, 5, 5, 1]
    merged = sds.materialize()
    for k in full.arrays:
        np.testing.assert_array_equal(merged.arrays[k], full.arrays[k])


def test_shard_split_across_chunk_boundary(tmp_path):
    # chunks of 3 and 4 rows re-bucketed into shards of 5: the writer must
    # split chunks, never drop or duplicate rows
    chunks = [
        {"redshift": np.arange(3, dtype=np.float32), "label": np.ones(3, np.int32)},
        {"redshift": np.arange(3, 7, dtype=np.float32), "label": np.ones(4, np.int32)},
        {"redshift": np.arange(7, 9, dtype=np.float32), "label": np.ones(2, np.int32)},
    ]
    sds = write_sharded_cache(str(tmp_path / "c"), iter(chunks), 5)
    assert sds.shard_sizes == [5, 4]
    np.testing.assert_array_equal(
        sds.materialize().arrays["redshift"], np.arange(9, dtype=np.float32)
    )


def test_chunk_iterator_respects_dataset_length(h5):
    chunks = list(iter_simulation_chunks(h5, dataset_length=10, **KW))
    assert sum(len(c["redshift"]) for c in chunks) == 10


def test_shard_epoch_schedule_constant_steps(h5, tmp_path):
    sds = stream_simulation_to_cache(h5, str(tmp_path / "p"), rows_per_shard=6,
                                     **KW)
    rng = np.random.default_rng(0)
    sched = shard_epoch_schedule(sds, batch_size=4, rng=rng)
    assert sorted(si for si, _ in sched) == list(range(sds.n_shards))
    steps = {plan.shape[0] for _, plan in sched}
    assert steps == {2}  # ceil(6/4): every shard padded to the full count
    for si, plan in sched:
        assert plan.max() < sds.shard_sizes[si]
        assert plan.shape[1] == 4


def _stream_trainer(run_dir, epochs):
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 100.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=1,
        loss="softmax", transformer_kwargs=seq, transformer_spectral_kwargs=seq,
        use_pallas=False,
    )
    return Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=epochs, batch_size=4, lr=1e-3, seed=0,
                          noise_level_mag=0.5),
        run_dir=run_dir,
    )


def test_fit_sharded_trains(h5, tmp_path):
    sds = stream_simulation_to_cache(h5, str(tmp_path / "t"), rows_per_shard=6,
                                     **KW)
    val = ingest_simulation(h5, dataset_length=8, **KW)
    run_dir = str(tmp_path / "run")
    res = _stream_trainer(run_dir, epochs=2).fit_sharded(sds, val)
    assert res["epochs_run"] == 2
    assert np.isfinite(res["history"]["train_loss"]).all()
    assert len(res["history"]["val_loss"]) == 2
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))


def test_fit_sharded_midepoch_resume_bit_identical(h5, tmp_path, monkeypatch):
    """A crash BETWEEN shards mid-epoch resumes from the shard cursor and
    finishes bit-identical to an uninterrupted run (VERDICT r3 item 2: the
    longest-running path must be the most recoverable)."""
    import jax

    from multimodal_supernovae_tpu.training import checkpoint as ckpt_mod

    sds = stream_simulation_to_cache(h5, str(tmp_path / "c"), rows_per_shard=6,
                                     **KW)
    assert sds.n_shards == 3
    val = ingest_simulation(h5, dataset_length=8, **KW)

    base = _stream_trainer(str(tmp_path / "base"), epochs=3).fit_sharded(
        sds, val
    )
    base_leaves = {
        jax.tree_util.keystr(p): np.asarray(l)
        for p, l in jax.tree_util.tree_leaves_with_path(base["state"].params)
    }

    # die right after the cursor save for epoch 1's SECOND shard lands —
    # the epoch is half done, exactly what a preemption leaves behind
    class Preempted(Exception):
        pass

    real_save = ckpt_mod.StreamCursor.save

    def save_then_die(self, gstep, *a, **k):
        real_save(self, gstep, *a, **k)
        if gstep == 1 * sds.n_shards + 1:
            self.wait()
            raise Preempted()

    run_dir = str(tmp_path / "killed")
    monkeypatch.setattr(ckpt_mod.StreamCursor, "save", save_then_die)
    with pytest.raises(Preempted):
        _stream_trainer(run_dir, epochs=3).fit_sharded(sds, val)
    monkeypatch.setattr(ckpt_mod.StreamCursor, "save", real_save)

    res = _stream_trainer(run_dir, epochs=3).fit_sharded(
        sds, val, resume=True
    )
    assert res["epochs_run"] == 3
    # the resumed run's first epoch is the re-entered epoch 1
    assert res["metric_rows"][0]["epoch"] == 1
    got = {
        jax.tree_util.keystr(p): np.asarray(l)
        for p, l in jax.tree_util.tree_leaves_with_path(res["state"].params)
    }
    assert set(got) == set(base_leaves)
    for k in base_leaves:
        np.testing.assert_array_equal(
            got[k], base_leaves[k],
            err_msg=f"param {k} diverged after mid-epoch kill+resume",
        )
    # epoch metrics agree too (same losses, same eval keys)
    for row_b, row_r in zip(base["metric_rows"][1:], res["metric_rows"]):
        assert row_b["epoch"] == row_r["epoch"]
        np.testing.assert_allclose(
            row_b["train_loss"], row_r["train_loss"], rtol=1e-6
        )
        np.testing.assert_allclose(
            row_b["val_loss"], row_r["val_loss"], rtol=1e-6
        )


def test_val_holdout_split(tmp_path):
    """ValHoldout routes a deterministic fraction to validation, loses and
    duplicates nothing, and the persisted split reloads identically."""
    from multimodal_supernovae_tpu.data.streaming import (
        ValHoldout,
        load_val_split,
        save_val_split,
    )

    chunks = [
        {"redshift": np.arange(40, dtype=np.float32)},
        {"redshift": np.arange(40, 100, dtype=np.float32)},
    ]
    holdout = ValHoldout(0.25, seed=3)
    sds = write_sharded_cache(
        str(tmp_path / "v"), holdout.wrap(iter(chunks)), 16
    )
    val = holdout.dataset()
    train_vals = sds.materialize().arrays["redshift"]
    all_vals = np.sort(np.concatenate([train_vals, val.arrays["redshift"]]))
    np.testing.assert_array_equal(all_vals, np.arange(100, dtype=np.float32))
    assert 5 <= len(val) <= 50  # ~25 expected

    save_val_split(str(tmp_path / "v"), val)
    reloaded = load_val_split(str(tmp_path / "v"))
    np.testing.assert_array_equal(
        reloaded.arrays["redshift"], val.arrays["redshift"]
    )

    # the cap binds: later chunks pass through untouched beyond it
    capped = ValHoldout(0.5, seed=0, cap=10)
    list(capped.wrap(iter([{"redshift": np.arange(100, dtype=np.float32)}])))
    assert len(capped.dataset()) == 10
