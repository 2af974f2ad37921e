import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
from multimodal_supernovae_tpu.ops.losses import (
    clip_loss_multimodal,
    clip_loss_multimodal_sharded,
)
from multimodal_supernovae_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_sharding_rules,
    shard_params,
)
from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8 and mesh.shape[MODEL_AXIS] == 1
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape[DATA_AXIS] == 4 and mesh2.shape[MODEL_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(8, 3)


def test_sharded_clip_loss_matches_global(rng):
    """The all-gathered per-chip CLIP loss must equal the single-device
    global-batch loss — the invariant that makes negatives scale with
    chips."""
    mesh = make_mesh(8, 1)
    n, d = 32, 8
    embs = [
        rng.normal(size=(n, d)).astype(np.float32) for _ in range(2)
    ]
    embs = [e / np.linalg.norm(e, axis=-1, keepdims=True) for e in embs]
    scale, bias = jnp.float32(2.0), jnp.float32(-1.0)
    want = float(clip_loss_multimodal([jnp.array(e) for e in embs], scale, bias))

    sharded_loss = shard_map(
        lambda e1, e2: clip_loss_multimodal_sharded([e1, e2], scale, bias, DATA_AXIS),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),  # identical on all chips after the gather
        check_vma=False,
    )
    got = float(sharded_loss(jnp.array(embs[0]), jnp.array(embs[1])))
    assert got == pytest.approx(want, rel=1e-5)


def test_param_sharding_rules_tensor_parallel(rng):
    mesh = make_mesh(4, 2)
    cfg = CLIPConfig.create(
        combinations=("lightcurve",),
        enc_dim=8,
        nband=2,
        regression=True,
        transformer_kwargs=SEQ,
        use_pallas=False,
    )
    model = CLIPModel(cfg)
    ds = make_synthetic_dataset(n=8, n_max_lc=8, seed=0)
    batch = ds.host_batch(np.arange(8))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    rules = param_sharding_rules(params, mesh)
    enc = rules["lightcurve_encoder"]["transformer"]["block_0"]
    # FF expansion kernel column-split over model axis; contraction row-split
    assert enc["ff_in"]["kernel"].spec == P(None, MODEL_AXIS)
    assert enc["ff_out"]["kernel"].spec == P(MODEL_AXIS, None)
    # attention kernels replicated
    assert enc["attention"]["tokeys"]["kernel"].spec == P()
    sharded = shard_params(params, mesh)
    out = model.apply({"params": sharded}, batch)
    assert out.shape == (8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_on_data_parallel_mesh():
    mesh = make_mesh(8, 1)
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=5)
    train, val = ds.subset(np.arange(48)), ds.subset(np.arange(48, 64))
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"),
        enc_dim=8,
        nband=2,
        loss="softmax",
        transformer_kwargs=SEQ,
        transformer_spectral_kwargs=SEQ,
        use_pallas=False,
    )
    trainer = Trainer(
        CLIPModel(cfg),
        task="contrastive",
        cfg=TrainerConfig(epochs=4, batch_size=16, lr=3e-3, seed=0),
        run_dir=None,
        mesh=mesh,
    )
    res = trainer.fit(train, val)
    assert res["history"]["train_loss"][-1] < res["history"]["train_loss"][0]
