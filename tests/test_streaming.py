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


def test_fit_sharded_trains(h5, tmp_path):
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    sds = stream_simulation_to_cache(h5, str(tmp_path / "t"), rows_per_shard=6,
                                     **KW)
    val = ingest_simulation(h5, dataset_length=8, **KW)
    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 100.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=1,
        loss="softmax", transformer_kwargs=seq, transformer_spectral_kwargs=seq,
        use_pallas=False,
    )
    run_dir = str(tmp_path / "run")
    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=2, batch_size=4, lr=1e-3, seed=0,
                          noise_level_mag=0.5),
        run_dir=run_dir,
    )
    res = trainer.fit_sharded(sds, val)
    assert res["epochs_run"] == 2
    assert np.isfinite(res["history"]["train_loss"]).all()
    assert len(res["history"]["val_loss"]) == 2
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
