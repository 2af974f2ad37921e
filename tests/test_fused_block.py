"""Fused transformer-block kernel vs the unfused flax path (interpret mode).

The fused kernel must be a pure placement/fusion choice: outputs AND all
gradients (input + every weight) match the reference TransformerBlock
(models/transformer.py) to float tolerance, including padded/fully-masked
rows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from multimodal_supernovae_tpu.models.transformer import TransformerBlock
from multimodal_supernovae_tpu.ops.fused_block import (
    fused_transformer_block,
    supports,
)

B, T, E, H, FM = 4, 24, 16, 2, 4  # head dim 8: sublane-exact


def _params_dict(p):
    a = p["attention"]
    return {
        "toqueries": a["toqueries"]["kernel"],
        "tokeys": a["tokeys"]["kernel"],
        "tovalues": a["tovalues"]["kernel"],
        "unifyheads_kernel": a["unifyheads"]["kernel"],
        "unifyheads_bias": a["unifyheads"]["bias"],
        "norm1_scale": p["norm1"]["scale"],
        "norm1_bias": p["norm1"]["bias"],
        "ff_in_kernel": p["ff_in"]["kernel"],
        "ff_in_bias": p["ff_in"]["bias"],
        "ff_out_kernel": p["ff_out"]["kernel"],
        "ff_out_bias": p["ff_out"]["bias"],
        "norm2_scale": p["norm2"]["scale"],
        "norm2_bias": p["norm2"]["bias"],
    }


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, E)), jnp.float32)
    mask = jnp.asarray(rng.random((B, T)) > 0.3)
    mask = mask.at[0].set(False)  # one fully-masked sample
    block = TransformerBlock(emb=E, heads=H, ff_hidden_mult=FM,
                             use_pallas=False)
    params = block.init(jax.random.PRNGKey(0), x, mask)["params"]
    # randomise the norm/bias params so grads through them are non-trivial
    params = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(rng.normal(size=v.shape), v.dtype) * 0.05,
        params,
    )
    return block, params, x, mask


def test_supports():
    assert supports(64, 8)
    assert not supports(32, 2)  # E=32: lane padding loses to XLA
    assert not supports(60, 6)  # head dim 10: not a sublane multiple
    assert not supports(512, 4)  # beyond the VMEM budget
    # the VMEM estimate must use the block's REAL hidden width:
    # E=256 fits at the default 4x but not at 16x (ADVICE r2)
    assert supports(256, 4, ff_hidden_mult=4)
    assert not supports(256, 4, ff_hidden_mult=16)


def test_forward_matches_unfused(setup):
    block, params, x, mask = setup
    ref = block.apply({"params": params}, x, mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_transformer_block(x, mask, _params_dict(params), H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_no_mask(setup):
    block, params, x, _ = setup
    ref = block.apply({"params": params}, x, None)
    with pltpu.force_tpu_interpret_mode():
        got = fused_transformer_block(x, None, _params_dict(params), H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_unfused(setup):
    block, params, x, mask = setup
    cot = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, E)),
                      jnp.float32)

    def ref_loss(params, x):
        return (block.apply({"params": params}, x, mask) * cot).sum()

    def fused_loss(params, x):
        return (fused_transformer_block(x, mask, _params_dict(params), H)
                * cot).sum()

    ref_gp, ref_gx = jax.grad(ref_loss, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        got_gp, got_gx = jax.grad(fused_loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat_got = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(got_gp)
    )
    for k, vref in flat_ref:
        vgot = flat_got[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(vgot), np.asarray(vref), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_encoder_fused_matches_unfused():
    """SequenceEncoder(use_fused_block=True) routes blocks through the fused
    kernel with an IDENTICAL param tree — same init, same outputs.
    ``use_pallas`` no longer opts into the fused block (ADVICE r2): it only
    selects the attention dispatch."""
    from multimodal_supernovae_tpu.models import SequenceEncoder

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 48)), jnp.float32)
    t = jnp.asarray(rng.random((3, 48)) * 100, jnp.float32)
    mask = jnp.asarray(rng.random((3, 48)) > 0.2)
    # emb=64: the supports() gate requires full lane occupancy (E >= 64)
    enc_u = SequenceEncoder(n_out=4, emb=64, heads=8, depth=2, agg="attn",
                            use_pallas=False)
    enc_f = SequenceEncoder(n_out=4, emb=64, heads=8, depth=2, agg="attn",
                            use_pallas=False, use_fused_block=True)
    params_u = enc_u.init(jax.random.PRNGKey(0), x, t, mask)
    with pltpu.force_tpu_interpret_mode():
        params_f = enc_f.init(jax.random.PRNGKey(0), x, t, mask)
        # identical tree: same paths, shapes AND init values
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            params_u, params_f,
        )
        out_f = enc_f.apply(params_u, x, t, mask)
    out_u = enc_u.apply(params_u, x, t, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)


def test_use_pallas_does_not_select_fused_block(monkeypatch):
    """``use_pallas=True`` historically ALSO opted into the fused-block
    kernel, so benchmarks forcing flash attention silently measured the
    fused path (ADVICE r2, medium). Pin the decoupling: only
    ``use_fused_block``/MMSN_FUSED_BLOCK may route here."""
    from multimodal_supernovae_tpu.ops import fused_block as fb

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 48, 64)), jnp.float32)
    mask = jnp.asarray(rng.random((3, 48)) > 0.2)
    # heads=2: B*H=6 fails the flash sublane gate, so use_pallas=True falls
    # back to dense attention on CPU — but the fused-block supports() gate
    # (E=64, head dim 32) would still pass.
    block = TransformerBlock(emb=64, heads=2, use_pallas=True)
    params = TransformerBlock(emb=64, heads=2, use_pallas=False).init(
        jax.random.PRNGKey(0), x, mask
    )

    def boom(*a, **k):
        raise AssertionError("fused block selected by use_pallas=True")

    monkeypatch.delenv("MMSN_FUSED_BLOCK", raising=False)
    monkeypatch.setattr(fb, "fused_transformer_block", boom)
    block.apply(params, x, mask)  # must take the unfused path

    # The env opt-in only engages on the TPU backend (it selects a
    # pltpu.VMEM kernel); fake the backend to exercise the routing on CPU.
    monkeypatch.setenv("MMSN_FUSED_BLOCK", "1")
    TransformerBlock(emb=64, heads=2).apply(params, x, mask)  # CPU: unfused

    import multimodal_supernovae_tpu.models.transformer as tr

    monkeypatch.setattr(tr.jax, "default_backend", lambda: "tpu")
    with pytest.raises(AssertionError, match="fused block selected"):
        TransformerBlock(emb=64, heads=2).apply(params, x, mask)

    # MMSN_FUSED_BLOCK=0 is a kill switch even over an explicit field.
    monkeypatch.setenv("MMSN_FUSED_BLOCK", "0")
    TransformerBlock(emb=64, heads=2, use_fused_block=True).apply(
        params, x, mask
    )  # unfused: no boom


def test_bf16_close_to_f32(setup):
    block, params, x, mask = setup
    ref = block.apply({"params": params}, x, mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_transformer_block(x.astype(jnp.bfloat16), mask,
                                      _params_dict(params), H)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)
