"""End-to-end trained-checkpoint parity against the reference's REAL models.

For representative shipped families, build the oracle with the reference's
own ``initialize_model`` (src/models_multimodal.py:583-680, loaded with
stubbed lightning/wandb/ruamel — tests/ref_modules.py), load the trained
state_dict strictly, and compare its outputs against this framework's
``load_model`` path on identical inputs:

- clip_real_lc_meta: contrastive lc+meta embeddings (attn-agg tower, meta
  class-embedding + redshift MLP);
- clip_real_lc_spectral_masked_noiseless_f25_backbonefrozen: contrastive
  lc+spectral embeddings (two towers);
- lc_5way_f1: supervised classification logits through the linear head;
- sp_reg: supervised regression output from the spectral tower;
- masked_pretraining_noiseless_f15: MAE reconstruction through the
  reference's MaskedLightCurveEncoder (src/models_pretraining.py:101-166).

Tolerance 5e-4 abs/rel: f32 accumulation-order differences across XLA vs
torch CPU kernels over 5-13 block towers; outputs are O(1).
"""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)

RTOL = ATOL = 5e-4


def _inputs(rng, b=4, t=20, s=12):
    x_lc = rng.normal(size=(b, t)).astype(np.float32)
    t_lc = (rng.random((b, t)) * 50).astype(np.float32)
    m_lc = rng.random((b, t)) > 0.25
    m_lc[:, 0] = True
    x_sp = rng.normal(size=(b, s)).astype(np.float32)
    t_sp = np.linspace(3000, 9000, s, dtype=np.float32)[None].repeat(b, 0)
    m_sp = np.ones((b, s), dtype=bool)
    z = rng.random(b).astype(np.float32)
    label = rng.integers(0, 5, b).astype(np.int64)
    return x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, z, label


def _our_forward(run_dir, inputs):
    import jax

    from multimodal_supernovae_tpu.data.batching import Batch
    from multimodal_supernovae_tpu.models.factory import load_model

    x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, z, label = inputs
    batch = Batch(
        x_lc=x_lc, t_lc=t_lc, mask_lc=m_lc,
        err_lc=np.zeros_like(x_lc),
        x_sp=x_sp, t_sp=t_sp, mask_sp=m_sp,
        err_sp=np.zeros_like(x_sp),
        redshift=z, label=label.astype(np.int32),
    )
    model, variables, _, _, _, _ = load_model(run_dir, batch)
    return model, model.apply(variables, batch)


def _ref_forward(run_dir, inputs):
    import torch

    from multimodal_supernovae_tpu.models.factory import _pick_reference_ckpt
    from ref_modules import load_reference_models

    ref = load_reference_models()
    ckpt = _pick_reference_ckpt(run_dir, "best")
    model = ref.initialize_model(ckpt)[0]
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)["state_dict"]
    model.load_state_dict(sd)
    model.eval()
    x_lc, t_lc, m_lc, x_sp, t_sp, m_sp, z, label = inputs
    with torch.no_grad():
        out = model(
            None,
            torch.tensor(x_lc), torch.tensor(t_lc), torch.tensor(m_lc),
            torch.tensor(x_sp), torch.tensor(t_sp), torch.tensor(m_sp),
            redshift=torch.tensor(z), classification=torch.tensor(label),
        )
    if isinstance(out, list):
        return [o.numpy() for o in out]
    return out.numpy()


FAMILY_RUNS = {
    "clip_real_lc_meta": "radiant-sweep-3",
    "clip_real_lc_spectral_masked_noiseless_f25_backbonefrozen": None,
    "lc_5way_f1": None,
    "sp_reg": None,
}


@pytest.mark.parametrize("family", sorted(FAMILY_RUNS))
def test_trained_fullmodel_parity(rng, family):
    import glob

    fam_dir = os.path.join(REF, "models", family)
    run = FAMILY_RUNS[family]
    if run is None:
        runs = sorted(
            d for d in os.listdir(fam_dir)
            if os.path.isdir(os.path.join(fam_dir, d))
            and glob.glob(os.path.join(fam_dir, d, "*.ckpt"))
        )
        run = runs[0]
    run_dir = os.path.join(fam_dir, run)
    inputs = _inputs(rng)

    want = _ref_forward(run_dir, inputs)
    model, got = _our_forward(run_dir, inputs)

    if isinstance(want, list):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=RTOL, atol=ATOL)
    else:
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_trained_masked_pretrainer_parity(rng):
    """Trained net.*/last_layer.* weights -> identical reconstructions from
    the reference's MaskedLightCurveEncoder and ours (prediction path; the
    random mask draw itself is RNG-framework-specific)."""
    import glob

    import torch

    import jax

    from multimodal_supernovae_tpu.data.batching import Batch
    from multimodal_supernovae_tpu.models.factory import (
        _pick_reference_ckpt,
        load_model,
        load_run_config,
    )
    from ref_modules import load_reference_pretraining

    fam_dir = os.path.join(REF, "models", "masked_pretraining_noiseless_f15")
    run_dir = sorted(
        d for d in glob.glob(os.path.join(fam_dir, "*"))
        if os.path.isdir(d) and glob.glob(os.path.join(d, "*.ckpt"))
    )[0]
    run_cfg, _ = load_run_config(run_dir)
    ckpt = _pick_reference_ckpt(run_dir, "best")

    refmod = load_reference_pretraining()
    # same construction our factory derives from the run config; the
    # reference snapshot ships no training script for this model, so the
    # state_dict shapes are the architecture ground truth
    oracle = refmod.MaskedLightCurveEncoder(
        f_mask=float(run_cfg["f_mask"]),
        nband=2,
        transformer_kwargs={
            "n_out": int(run_cfg["n_out"]),
            "emb": int(run_cfg["emb"]),
            "heads": int(run_cfg["heads"]),
            "depth": int(run_cfg["transformer_depth"]),
            "dropout": float(run_cfg["dropout"]),
            "time_norm": float(run_cfg["time_norm"]),
        },
    )
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)["state_dict"]
    oracle.load_state_dict(sd)
    oracle.eval()

    x_lc, t_lc, m_lc, *_ = _inputs(rng)
    batch = Batch(x_lc=x_lc, t_lc=t_lc, mask_lc=m_lc,
                  err_lc=np.zeros_like(x_lc))
    model, variables, *_ = load_model(run_dir, batch)
    got = np.asarray(model.apply(variables, batch))
    with torch.no_grad():
        want = oracle(
            torch.tensor(x_lc), torch.tensor(t_lc), torch.tensor(m_lc)
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
