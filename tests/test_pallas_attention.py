"""Pallas flash-attention kernel vs the dense XLA path (interpret mode on
CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from multimodal_supernovae_tpu.ops.attention import dense_attention
from multimodal_supernovae_tpu.ops.pallas_attention import (
    flash_attention,
    supports,
)


def _inputs(rng, b=2, h=2, t=256, s=16, full_mask=False):
    q = rng.normal(size=(b, h, t, s)).astype(np.float32)
    k = rng.normal(size=(b, h, t, s)).astype(np.float32)
    v = rng.normal(size=(b, h, t, s)).astype(np.float32)
    if full_mask:
        mask = np.ones((b, t), dtype=bool)
    else:
        mask = rng.random((b, t)) > 0.3
        mask[:, 0] = True
    return map(jnp.asarray, (q, k, v, mask))


def test_supports():
    assert supports(1024, 8) and supports(256, 16) and supports(220, 32)
    assert not supports(256, 4)  # head dim below a sublane


@pytest.mark.parametrize("full_mask", [True, False])
@pytest.mark.parametrize("t", [256, 200])  # tile multiple and padded case
def test_forward_matches_dense(rng, full_mask, t):
    q, k, v, mask = _inputs(rng, t=t, full_mask=full_mask)
    emb = q.shape[1] * q.shape[3]
    want = dense_attention(q, k, v, mask, emb)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, mask, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_backward_padded_t(rng):
    q, k, v, mask = _inputs(rng, b=1, h=2, t=200, s=8)
    emb = q.shape[1] * q.shape[3]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, emb) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, mask, emb) ** 2)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-4)


def test_backward_matches_dense(rng):
    q, k, v, mask = _inputs(rng, b=1, h=2, t=128, s=8)
    emb = q.shape[1] * q.shape[3]

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, mask, emb) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, emb) ** 2)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_backward_fully_masked_row(rng):
    """A sample with NO valid keys: probs are uniform (finite), and the
    forward's where(mask, ., FILL) passes zero gradient to q/k there."""
    q, k, v, mask = _inputs(rng, b=2, h=2, t=128, s=8)
    mask = mask.at[0].set(False)
    emb = q.shape[1] * q.shape[3]

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, mask, emb) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, emb) ** 2)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    assert np.all(np.asarray(got[0][0]) == 0)  # dq of the masked sample
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_backward_bf16_dkdv_outputs(rng):
    """bf16 inputs take the r3 single-q-tile path where the kernel emits
    dk/dv in bf16 directly (no post-kernel convert); grads must still match
    the dense path at bf16 tolerance."""
    q, k, v, mask = _inputs(rng, b=1, h=2, t=40, s=8)
    q, k, v = (a.astype(jnp.bfloat16) for a in (q, k, v))
    emb = q.shape[1] * q.shape[3]

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, mask, emb).astype(jnp.float32) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, emb).astype(jnp.float32) ** 2)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        assert g.dtype == jnp.bfloat16, f"d{name} dtype {g.dtype}"
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            rtol=0.05, atol=0.05, err_msg=f"d{name} mismatch",
        )


def test_encoder_with_pallas_flag(rng):
    """SequenceEncoder(use_pallas=True) runs the kernel (interpret mode)."""
    from multimodal_supernovae_tpu.models import SequenceEncoder

    x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    t = jnp.asarray((rng.random((2, 256)) * 100).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 256)) > 0.2)
    enc_d = SequenceEncoder(n_out=4, emb=16, heads=2, depth=1, use_pallas=False)
    enc_p = SequenceEncoder(n_out=4, emb=16, heads=2, depth=1, use_pallas=True)
    params = enc_d.init(jax.random.PRNGKey(0), x, t, mask)
    with pltpu.force_tpu_interpret_mode():
        out_p = enc_p.apply(params, x, t, mask)
    out_d = enc_d.apply(params, x, t, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=1e-4, atol=1e-4)


def test_choose_nb_vmem_ceiling_short_sequences():
    """At short sequences the score-budget formula alone picks huge NB and
    the double-buffered block I/O overflows the ~16 MB VMEM by itself —
    observed as a remote Mosaic compile failure at the ViT tower's shapes
    (t=36->tq=40, s=32, bh=1024 picked nb=256; nb=128 compiles). The
    I/O-aware ceiling must bound it, while the reference LC/SP headline
    shapes keep their tuned nb=8."""
    from multimodal_supernovae_tpu.ops.pallas_attention import bwd_nb, fwd_nb

    # ViT tower shapes (60x60 images, patch 10 -> 36 tokens -> tq=40)
    assert bwd_nb(1024, 40, 40, 32) <= 128
    assert fwd_nb(1024, 40, 40, 32) <= 128
    # headline shapes unchanged: LC (t=200, s=8), SP (t=220->224, s=16)
    for bh in (2048, 8192):
        assert fwd_nb(bh, 200, 200, 8) == 8
        assert bwd_nb(bh, 200, 200, 8) == 8
    for bh in (1024, 4096):
        assert fwd_nb(bh, 224, 224, 16) == 8
        assert bwd_nb(bh, 224, 224, 16) == 8


def test_flash_matches_dense_at_vit_shapes(rng):
    """Interpret-mode parity at the short-sequence ViT shapes that used to
    fail Mosaic compile (fwd AND bwd through the custom VJP)."""
    q, k, v, mask = _inputs(rng, b=8, h=4, t=36, s=32, full_mask=True)
    emb = 128

    want = dense_attention(q, k, v, mask, emb)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, mask, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, mask, emb) ** 2).sum()

    def loss_dense(q, k, v):
        return (dense_attention(q, k, v, mask, emb) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gf, gd in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=2e-4, atol=2e-4)
