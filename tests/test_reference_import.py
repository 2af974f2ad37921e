"""Fidelity tests against REAL reference checkpoints.

BASELINE.json's output-fidelity requirement: embeddings computed with
imported reference weights must match the reference network's math. The
reference's own stack (pytorch_lightning) can't run here, so the oracle is
the independent torch reimplementation in benchmarks/baseline_torch.py
(written from the documented math, used for throughput baselining): load the
SAME trained weights into both, feed the SAME inputs, compare outputs.
"""

import os
import sys

import numpy as np
import pytest

REF_RUN = "/root/reference/models/clip_real_lc_meta/radiant-sweep-3"
REF_CKPT = os.path.join(REF_RUN, "last.ckpt")

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(REF_CKPT), reason="reference checkpoint not mounted"
)


@pytest.fixture(scope="module")
def ref_state_dict():
    import torch

    return {
        k: v.numpy()
        for k, v in torch.load(REF_CKPT, map_location="cpu", weights_only=False)[
            "state_dict"
        ].items()
    }


@needs_ckpt
def test_import_covers_encoder(ref_state_dict):
    from multimodal_supernovae_tpu.models.factory import import_reference_checkpoint

    params = import_reference_checkpoint(REF_CKPT)
    assert "lightcurve_encoder" in params
    enc = params["lightcurve_encoder"]
    assert enc["embedding_mag"]["kernel"].shape == (1, 64)
    assert "block_4" in enc["transformer"]  # depth 5
    assert enc["transformer"]["block_0"]["ff_in"]["kernel"].shape == (64, 256)
    assert float(params["logit_scale"]) == pytest.approx(
        float(ref_state_dict["logit_scale"])
    )


@needs_ckpt
def test_embedding_parity_with_torch_oracle(ref_state_dict, rng):
    """Trained reference weights -> identical light-curve embeddings from the
    JAX encoder and the independent torch oracle."""
    import torch

    import jax
    import jax.numpy as jnp

    from benchmarks.baseline_torch import SeqEncoder
    from multimodal_supernovae_tpu.models import SequenceEncoder
    from multimodal_supernovae_tpu.models.factory import import_reference_checkpoint
    from multimodal_supernovae_tpu.training.checkpoint import merge_params_nonstrict

    # --- torch oracle with the trained weights
    torch_enc = SeqEncoder(emb=64, heads=8, depth=5, n_out=32, nband=2,
                           time_norm=20583.369161312577)
    mapping = {
        "val.weight": "lightcurve_encoder.embedding_mag.weight",
        "val.bias": "lightcurve_encoder.embedding_mag.bias",
        "band.weight": "lightcurve_encoder.band_emb.weight",
        "proj.weight": "lightcurve_encoder.projection.weight",
        "proj.bias": "lightcurve_encoder.projection.bias",
    }
    for i in range(5):
        src = f"lightcurve_encoder.transformer.tblocks.{i}."
        dst = f"blocks.{i}."
        mapping.update({
            dst + "kqv.k.weight": src + "attention.tokeys.weight",
            dst + "kqv.q.weight": src + "attention.toqueries.weight",
            dst + "kqv.v.weight": src + "attention.tovalues.weight",
            dst + "unify.weight": src + "attention.unifyheads.weight",
            dst + "unify.bias": src + "attention.unifyheads.bias",
            dst + "norm1.weight": src + "norm1.weight",
            dst + "norm1.bias": src + "norm1.bias",
            dst + "norm2.weight": src + "norm2.weight",
            dst + "norm2.bias": src + "norm2.bias",
            dst + "ff.0.weight": src + "ff.0.weight",
            dst + "ff.0.bias": src + "ff.0.bias",
            dst + "ff.2.weight": src + "ff.2.weight",
            dst + "ff.2.bias": src + "ff.2.bias",
        })
    torch_enc.load_state_dict(
        {k: torch.tensor(ref_state_dict[v]) for k, v in mapping.items()}
    )
    torch_enc.eval()

    # --- JAX encoder with the imported weights
    jax_enc = SequenceEncoder(n_out=32, emb=64, heads=8, depth=5, nband=2,
                              agg="mean", time_norm=20583.369161312577,
                              use_pallas=False)
    b, t = 3, 200
    x = rng.normal(size=(b, t)).astype(np.float32)
    ts = (rng.random((b, t)) * 80).astype(np.float32)
    mask = rng.random((b, t)) > 0.25
    mask[:, 0] = True
    variables = jax_enc.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(ts),
                             jnp.array(mask))
    imported = import_reference_checkpoint(REF_CKPT)
    grafted = merge_params_nonstrict(
        variables["params"], imported["lightcurve_encoder"]
    )
    # every leaf must have been replaced by an imported value
    flat_t, _ = jax.tree_util.tree_flatten_with_path(grafted)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
    n_replaced = sum(
        not np.allclose(np.asarray(a[1]), np.asarray(b[1]))
        for a, b in zip(flat_t, flat_o)
    )
    assert n_replaced == len(flat_t), "some parameters were not imported"

    out_jax = np.asarray(
        jax_enc.apply({"params": grafted}, jnp.array(x), jnp.array(ts),
                      jnp.array(mask))
    )
    with torch.no_grad():
        out_torch = torch_enc(
            torch.tensor(x), torch.tensor(ts), torch.tensor(mask)
        ).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=2e-4, atol=2e-4)


@needs_ckpt
def test_masked_pretrain_ckpt_import():
    """A masked-pretraining checkpoint (net.* keys) imports into the MAE
    encoder subtree used by graft_masked_pretrain_into_clip."""
    import glob

    from multimodal_supernovae_tpu.models.factory import import_reference_checkpoint

    ckpts = glob.glob(
        "/root/reference/models/masked_pretraining_noiseless_f15/**/*.ckpt",
        recursive=True,
    )
    if not ckpts:
        pytest.skip("no masked pretraining checkpoint")
    params = import_reference_checkpoint(ckpts[0])
    assert "net" in params and "last_layer" in params
    assert params["last_layer"]["kernel"].shape[1] == 1
