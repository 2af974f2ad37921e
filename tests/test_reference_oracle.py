"""Parity tests against the REFERENCE'S OWN code as the oracle.

Round-1 pinned loss/embedding semantics against self-written numpy/torch
reimplementations (a shared misreading could pass). These tests instead load
the reference's actual modules — ``/root/reference/src/transformer_utils.py``
and ``/root/reference/src/loss.py`` import cleanly in this image (pure
torch) — and compare:

- clip/sigmoid losses (scalar and per-pair scale/bias vectors) against the
  reference's ``clip_loss``/``sigmoid_loss``/``*_multimodal``
  (src/loss.py:14-107);
- SequenceEncoder outputs against the reference's real
  ``TransformerWithTimeEmbeddings`` (src/transformer_utils.py:179-253) for
  ALL FOUR aggregations (mean/max/attn/pretraining) with nband=2, weights
  transferred through the production importer mapping
  (models/factory._import_seq_encoder).

Tolerances: f32 accumulation-order differences between XLA and torch CPU
kernels; 1e-5 relative on losses, 2e-5 absolute on embeddings (values are
O(1) after layernorm stacks).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_src():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import src.loss as ref_loss
    import src.transformer_utils as ref_tf

    return ref_loss, ref_tf


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


# ---------------------------------------------------------------- losses


def test_clip_loss_vs_reference(ref_src, rng):
    import torch

    import jax.numpy as jnp

    from multimodal_supernovae_tpu.ops.losses import clip_loss

    ref_loss, _ = ref_src
    e1 = _normalize(rng.normal(size=(8, 16))).astype(np.float32)
    e2 = _normalize(rng.normal(size=(8, 16))).astype(np.float32)
    for scale, bias in [(2.3, -1.0), (0.0, 0.0), (np.log(19.55), 2.73)]:
        want = float(
            ref_loss.clip_loss(
                torch.tensor(e1), torch.tensor(e2),
                torch.tensor(scale), torch.tensor(bias),
            )
        )
        got = float(
            clip_loss(jnp.array(e1), jnp.array(e2), jnp.float32(scale),
                      jnp.float32(bias))
        )
        assert got == pytest.approx(want, rel=1e-5)


def test_sigmoid_loss_vs_reference(ref_src, rng):
    import torch

    import jax.numpy as jnp

    from multimodal_supernovae_tpu.ops.losses import sigmoid_loss

    ref_loss, _ = ref_src
    e1 = _normalize(rng.normal(size=(6, 8))).astype(np.float32)
    e2 = _normalize(rng.normal(size=(6, 8))).astype(np.float32)
    for scale, bias in [(1.5, -10.0), (np.log(10.0), 2.73)]:
        want = float(
            ref_loss.sigmoid_loss(
                torch.tensor(e1), torch.tensor(e2),
                torch.tensor(scale), torch.tensor(bias),
            )
        )
        got = float(
            sigmoid_loss(jnp.array(e1), jnp.array(e2), jnp.float32(scale),
                         jnp.float32(bias))
        )
        # reference computes in f64; ours is a stable f32 log-sigmoid
        assert got == pytest.approx(want, rel=1e-4)


def test_multimodal_losses_vs_reference(ref_src, rng):
    import torch

    import jax.numpy as jnp

    from multimodal_supernovae_tpu.ops.losses import (
        clip_loss_multimodal,
        sigmoid_loss_multimodal,
    )

    ref_loss, _ = ref_src
    embs = [_normalize(rng.normal(size=(5, 8))).astype(np.float32)
            for _ in range(3)]
    t_embs = [torch.tensor(e) for e in embs]
    j_embs = [jnp.array(e) for e in embs]

    # scalar scale/bias broadcast over the 3 pairs
    want = float(ref_loss.clip_loss_multimodal(
        t_embs, torch.tensor(1.1), torch.tensor(-0.5)))
    got = float(clip_loss_multimodal(j_embs, jnp.float32(1.1), jnp.float32(-0.5)))
    assert got == pytest.approx(want, rel=1e-5)

    # per-pair vectors, reference pair order (i<j) enumerated row-major
    scales = np.array([1.0, 2.0, 0.5], dtype=np.float32)
    biases = np.array([0.0, -1.0, 0.3], dtype=np.float32)
    want = float(ref_loss.clip_loss_multimodal(
        t_embs, torch.tensor(scales), torch.tensor(biases)))
    got = float(clip_loss_multimodal(j_embs, jnp.array(scales), jnp.array(biases)))
    assert got == pytest.approx(want, rel=1e-5)

    want = float(ref_loss.sigmoid_loss_multimodal(
        t_embs, torch.tensor(scales), torch.tensor(biases)))
    got = float(sigmoid_loss_multimodal(j_embs, jnp.array(scales),
                                        jnp.array(biases)))
    assert got == pytest.approx(want, rel=1e-4)


# ---------------------------------------------------- sequence encoder


@pytest.mark.parametrize("agg", ["mean", "max", "attn", "pretraining"])
def test_sequence_encoder_vs_reference(ref_src, rng, agg):
    """Random-init reference TransformerWithTimeEmbeddings -> transfer weights
    through the production importer -> identical outputs from our encoder."""
    import torch

    import jax
    import jax.numpy as jnp

    from multimodal_supernovae_tpu.models import SequenceEncoder
    from multimodal_supernovae_tpu.models.factory import _import_seq_encoder
    from multimodal_supernovae_tpu.training.checkpoint import merge_params_nonstrict

    _, ref_tf = ref_src
    emb, heads, depth, n_out, nband = 32, 4, 2, 16, 2
    time_norm = 1000.0
    torch.manual_seed(3)
    ref = ref_tf.TransformerWithTimeEmbeddings(
        n_out=n_out, nband=nband, agg=agg, time_norm=time_norm,
        emb=emb, heads=heads, depth=depth,
    )
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = _import_seq_encoder(sd, "")

    ours = SequenceEncoder(
        n_out=n_out, emb=emb, heads=heads, depth=depth, nband=nband, agg=agg,
        time_norm=time_norm, use_pallas=False,
    )
    b, t = 4, 20  # band-blocked: positions [0,10) band 0, [10,20) band 1
    x = rng.normal(size=(b, t)).astype(np.float32)
    ts = (rng.random((b, t)) * 50).astype(np.float32)
    mask = rng.random((b, t)) > 0.3
    mask[:, 0] = True

    variables = ours.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(ts),
                          jnp.array(mask))
    grafted = merge_params_nonstrict(variables["params"], imported)
    out_jax = np.asarray(
        ours.apply({"params": grafted}, jnp.array(x), jnp.array(ts),
                   jnp.array(mask))
    )

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(x)[..., None], torch.tensor(ts), torch.tensor(mask)
        ).numpy()

    assert out_jax.shape == out_ref.shape
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-4, atol=2e-5)
