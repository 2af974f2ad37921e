"""Data-parallel correctness: the mesh-sharded train step must produce the
same losses and parameters as the single-device step — sharding is a
placement choice, never a semantics choice. (The contrastive loss makes
this non-trivial: every pair of samples interacts, so XLA must gather the
full embedding sets across the data axis.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
from multimodal_supernovae_tpu.parallel import make_mesh
from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

SEQ = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
       "agg": "mean", "dropout": 0.0}


def run(mesh, ds, epochs=3):
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax",
        transformer_kwargs=SEQ, transformer_spectral_kwargs=SEQ,
        use_pallas=False,
    )
    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=epochs, batch_size=16, lr=3e-3, seed=0,
                          noise_level_mag=1.0),
        run_dir=None,
        mesh=mesh,
    )
    train, val = ds.subset(np.arange(48)), ds.subset(np.arange(48, 64))
    return trainer.fit(train, val)


def test_dp_matches_single_device():
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=0)
    res_single = run(None, ds, epochs=2)
    res_dp = run(make_mesh(8, 1), ds, epochs=2)
    np.testing.assert_allclose(
        res_single["history"]["train_loss"],
        res_dp["history"]["train_loss"],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        res_single["history"]["val_loss"], res_dp["history"]["val_loss"],
        rtol=2e-5, atol=2e-5,
    )
    # final params agree leaf-by-leaf
    flat_s = jax.tree_util.tree_leaves(res_single["state"].params)
    flat_d = jax.tree_util.tree_leaves(res_dp["state"].params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_dp_tp_matches_single_device():
    """Adding tensor parallelism over the model axis must also be exact."""
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=1)
    res_single = run(None, ds, epochs=1)
    res_tp = run(make_mesh(4, 2), ds, epochs=1)
    np.testing.assert_allclose(
        res_single["history"]["train_loss"],
        res_tp["history"]["train_loss"],
        rtol=5e-5, atol=5e-5,
    )


@pytest.mark.parametrize("tower", ["convmixer", "vit"])
def test_dp_trimodal_image_towers_match_single_device(tower):
    """Image towers under DP: ConvMixer's BatchNorm must compute GLOBAL
    batch statistics (cross-chip axis sync) for dp8 to equal the
    single-device run; the ViT has no batch statistics by design and must
    be exact trivially."""
    ds = make_synthetic_dataset(
        n=64, n_max_lc=8, n_max_sp=8, image_size=20, seed=2,
        modalities=("host_galaxy", "lightcurve", "spectral"),
    )

    def run_tri(mesh):
        cfg = CLIPConfig.create(
            combinations=("host_galaxy", "lightcurve", "spectral"),
            enc_dim=8, nband=2, loss="softmax",
            transformer_kwargs=SEQ, transformer_spectral_kwargs=SEQ,
            conv_kwargs={"dim": 8, "depth": 2, "kernel_size": 3,
                         "patch_size": 5, "n_out": 8, "dropout_prob": 0.0},
            vit_kwargs={"emb": 16, "depth": 1, "heads": 2, "patch_size": 5,
                        "n_out": 8, "dropout_prob": 0.0},
            image_encoder=tower,
            use_pallas=False,
        )
        trainer = Trainer(
            CLIPModel(cfg), task="contrastive",
            cfg=TrainerConfig(epochs=1, batch_size=16, lr=3e-3, seed=0,
                              noise_level_mag=1.0),
            run_dir=None,
            mesh=mesh,
        )
        train, val = ds.subset(np.arange(48)), ds.subset(np.arange(48, 64))
        return trainer.fit(train, val)

    res_single = run_tri(None)
    res_dp = run_tri(make_mesh(8, 1))
    np.testing.assert_allclose(
        res_single["history"]["train_loss"],
        res_dp["history"]["train_loss"], rtol=5e-5, atol=5e-5,
    )
    flat_s = jax.tree_util.tree_leaves(res_single["state"].params)
    flat_d = jax.tree_util.tree_leaves(res_dp["state"].params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)
    if tower == "convmixer":
        # the running statistics themselves must be identical too
        for a, b in zip(
            jax.tree_util.tree_leaves(res_single["state"].batch_stats),
            jax.tree_util.tree_leaves(res_dp["state"].batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5)
