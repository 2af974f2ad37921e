"""Integration: the model factory consumes the REFERENCE's own run
directories (their config.yaml + ../sweep_config.yaml contract is the same
one this framework writes), and imported weights drive a full CLIP forward.
"""

import os

import numpy as np
import pytest

REF_RUN = "/root/reference/models/clip_real_lc_meta/radiant-sweep-3"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_RUN), reason="reference models not mounted"
)


@needs_ref
def test_initialize_from_reference_run_dir():
    from multimodal_supernovae_tpu.models.factory import (
        initialize_from_run_dir,
        load_run_config,
    )

    run_cfg, extra = load_run_config(REF_RUN)
    assert run_cfg["emb"] == 64 and run_cfg["transformer_depth"] == 5
    model, _, _ = initialize_from_run_dir(
        REF_RUN, combinations=("lightcurve", "meta")
    )
    c = model.cfg
    assert c.combinations == ("lightcurve", "meta")
    assert dict(c.transformer_kwargs)["emb"] == 64
    assert dict(c.transformer_kwargs)["agg"] == "mean"
    # the reference's shared space is always the constructor default 128
    assert c.enc_dim == 128


@needs_ref
def test_full_clip_forward_with_reference_weights(rng):
    """Reference ckpt -> our CLIPModel(lightcurve+meta): normalized
    embeddings from genuinely trained weights."""
    import jax

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models.factory import (
        import_reference_checkpoint,
        initialize_from_run_dir,
    )
    from multimodal_supernovae_tpu.training.checkpoint import (
        merge_params_nonstrict,
    )

    model, _, _ = initialize_from_run_dir(
        REF_RUN, combinations=("lightcurve", "meta")
    )
    ds = make_synthetic_dataset(n=8, n_max_lc=100, nband=2, seed=0,
                                modalities=("lightcurve",))
    batch = ds.host_batch(np.arange(8))
    variables = model.init(jax.random.PRNGKey(0), batch)
    imported = import_reference_checkpoint(os.path.join(REF_RUN, "last.ckpt"))
    assert "class_emb" in imported and "meta_encoder" in imported
    merged = merge_params_nonstrict(variables["params"], imported)
    # the merge replaced the lightcurve encoder wholesale
    k_new = np.asarray(merged["lightcurve_encoder"]["embedding_mag"]["kernel"])
    k_old = np.asarray(
        variables["params"]["lightcurve_encoder"]["embedding_mag"]["kernel"]
    )
    assert not np.allclose(k_new, k_old)
    embs = model.apply({"params": merged}, batch)
    assert len(embs) == 2  # lightcurve + meta
    for e in embs:
        assert np.isfinite(np.asarray(e)).all()
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5
        )
    # meta MLP import shape sanity: hidden 128 -> enc_dim 128
    assert imported["meta_encoder"]["out"]["kernel"].shape[1] == 128
    # projections map n_out 32 -> enc_dim 128
    assert imported["lightcurve_projection"]["kernel"].shape == (32, 128)


@needs_ref
def test_load_model_on_reference_run_dir(rng):
    """scripts-level entry: load_model consumes the reference's own run dir
    (torch .ckpt + manifests) and produces working embeddings."""
    import jax

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models.factory import load_model

    ds = make_synthetic_dataset(n=4, n_max_lc=100, nband=2, seed=0,
                                modalities=("lightcurve",))
    example = ds.host_batch(np.arange(4))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        REF_RUN, example
    )
    assert len(train_names) > len(val_names) > 0
    assert all(n.startswith("ZTF") for n in val_names)
    embs = model.apply(variables, example)
    assert len(embs) == len(model.cfg.combinations)
    e = np.asarray(embs[0])
    assert np.isfinite(e).all()
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)


@needs_ref
def test_get_checkpoint_paths_walks_reference_models():
    from multimodal_supernovae_tpu.models.factory import get_checkpoint_paths

    paths, names, ids = get_checkpoint_paths(
        "/root/reference/models/clip_real_lc_meta", "clip-real-lc-meta", 0
    )
    assert len(paths) >= 3  # one smallest-epoch ckpt per sweep run
    assert all(p.endswith(".ckpt") for p in paths)
    assert set(names) == {"clip-real-lc-meta"}
