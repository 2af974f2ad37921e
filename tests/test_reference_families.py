"""Fidelity breadth: every shipped reference model family loads here.

VERDICT r1 missing #1 / weak #7: round 1 exercised one CLIP family
(clip_real_lc_meta) plus one masked ckpt. These tests walk EVERY family
directory under /root/reference/models that ships a resolvable checkpoint
(several families contain only configs or dead symlinks to the authors'
cluster — skipped with a reason, listed in ROUND2_NOTES.md), and check:

- fast: ``import_reference_checkpoint`` consumes the ckpt and produces the
  subtrees its state_dict implies (encoder/head/masked-net coverage);
- slow: the full ``load_model`` path (config.yaml + sweep extra_args ->
  model; ckpt -> params) runs a forward pass with trained weights and yields
  finite, task-appropriately-shaped outputs. Masked-pretraining families
  (net.*/last_layer.* ckpts) load as MaskedLightCurveEncoder — a path the
  reference's own load_model (models_multimodal.py:683-758) does not have.
"""

import glob
import os

import numpy as np
import pytest

ROOT = "/root/reference/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="reference models not mounted"
)


def _runs_with_ckpt(family):
    out = []
    fam_dir = os.path.join(ROOT, family)
    for run in sorted(os.listdir(fam_dir)):
        rd = os.path.join(fam_dir, run)
        if not os.path.isdir(rd):
            continue
        cks = [c for c in glob.glob(os.path.join(rd, "*.ckpt"))
               if os.path.exists(c)]
        if cks and os.path.exists(os.path.join(rd, "config.yaml")):
            out.append(rd)
    return out


def _families():
    if not os.path.isdir(ROOT):
        return []
    return sorted(
        f for f in os.listdir(ROOT)
        if os.path.isdir(os.path.join(ROOT, f)) and _runs_with_ckpt(f)
    )


FAMILIES = _families()


def test_family_inventory_is_complete():
    """28 of the 40 family dirs ship at least one resolvable ckpt; the rest
    hold only configs/plots or dead cluster symlinks. Pin the inventory so a
    future remount grows coverage loudly instead of silently."""
    assert len(FAMILIES) >= 28, FAMILIES


@pytest.mark.parametrize("family", FAMILIES)
def test_checkpoint_imports(family):
    from multimodal_supernovae_tpu.models.factory import (
        _pick_reference_ckpt,
        import_reference_checkpoint,
    )

    run_dir = _runs_with_ckpt(family)[0]
    ckpt = _pick_reference_ckpt(run_dir, "best")
    import torch

    sd = torch.load(ckpt, map_location="cpu", weights_only=False)["state_dict"]
    params = import_reference_checkpoint(ckpt)

    has = lambda p: any(k.startswith(p) for k in sd)
    if has("lightcurve_encoder."):
        assert "lightcurve_encoder" in params and "lightcurve_projection" in params
        depth = len(params["lightcurve_encoder"]["transformer"])
        assert depth == sum(1 for k in sd if k.endswith("norm1.weight")
                            and k.startswith("lightcurve_encoder."))
    if has("spectral_encoder."):
        assert "spectral_encoder" in params and "spectral_projection" in params
    if has("class_emb."):
        assert "class_emb" in params and "meta_encoder" in params
    if has("linear."):
        assert "linear" in params
    if has("net."):
        assert "net" in params and "last_layer" in params
    if "logit_scale" in sd:
        assert float(params["logit_scale"]) == pytest.approx(
            float(np.asarray(sd["logit_scale"]))
        )
    # nothing with trainable weights silently dropped: every state_dict
    # parameter tensor's byte count is accounted for in the imported tree
    import jax

    n_sd = sum(int(np.prod(v.shape)) for v in sd.values())
    n_imported = sum(
        int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params)
    )
    assert n_imported == n_sd, (n_imported, n_sd)


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_family_load_model_forward(family):
    """Full production path per family: run dir -> model + trained params ->
    forward on synthetic inputs -> finite, correctly-shaped outputs."""
    import jax

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models.factory import load_model
    from multimodal_supernovae_tpu.models.pretraining import (
        MaskedLightCurveEncoder,
    )

    run_dir = _runs_with_ckpt(family)[0]
    b = 4
    ds = make_synthetic_dataset(
        n=b, n_max_lc=10, nband=2, n_max_sp=12, seed=0,
        modalities=("lightcurve", "spectral"),
    )
    example = ds.host_batch(np.arange(b))
    model, variables, run_cfg, extra, train_names, val_names = load_model(
        run_dir, example
    )
    if os.path.exists(os.path.join(run_dir, "train_filenames.txt")):
        assert train_names and val_names
    else:
        # masked_pretraining_f* runs ship without split manifests
        assert train_names == [] and val_names == []

    out = model.apply(variables, example)
    if isinstance(model, MaskedLightCurveEncoder):
        assert out.shape == example.x_lc.shape
        assert np.isfinite(np.asarray(out)).all()
        return
    if model.cfg.regression or model.cfg.classification:
        n_out = model.cfg.n_classes if model.cfg.classification else 1
        assert out.shape == (b, n_out)
        assert np.isfinite(np.asarray(out)).all()
    else:
        assert len(out) == len(model.cfg.combinations)
        for e in out:
            assert np.isfinite(np.asarray(e)).all()
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-4
            )
