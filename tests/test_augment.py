import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_supernovae_tpu.data.augment import (
    augment_batch,
    contiguous_span_mask,
    image_uniform_noise,
    noise_from_error,
    random_rot90,
    random_subset_mask,
)
from multimodal_supernovae_tpu.data.batching import Batch


def test_noise_from_error_scales(rng):
    x = jnp.zeros((1000, 4))
    err = jnp.full((1000, 4), 2.0)
    out = noise_from_error(x, err, 1.0, jax.random.PRNGKey(0))
    assert float(jnp.std(out)) == pytest.approx(2.0, rel=0.1)
    out0 = noise_from_error(x, err, 0.0, jax.random.PRNGKey(0))
    assert float(jnp.abs(out0).max()) == 0.0


def test_image_uniform_noise_range(rng):
    img = jnp.array(rng.random((8, 10, 10, 3)).astype(np.float32))
    out = image_uniform_noise(img, 0.5, jax.random.PRNGKey(0))
    bound = 0.5 * float(jnp.std(img))
    assert float(jnp.abs(out - img).max()) <= bound + 1e-6


def test_random_rot90_is_permutation(rng):
    img = jnp.array(rng.random((16, 6, 6, 3)).astype(np.float32))
    out = random_rot90(img, jax.random.PRNGKey(3))
    # rotation preserves the multiset of pixel values per image
    for i in range(16):
        np.testing.assert_allclose(
            np.sort(np.asarray(out[i]).ravel()), np.sort(np.asarray(img[i]).ravel())
        )
    # with 16 images, at least one should be non-identity
    assert not np.allclose(np.asarray(out), np.asarray(img))


def test_augment_batch_jits(rng):
    b = Batch(
        x_lc=jnp.array(rng.normal(size=(4, 10)).astype(np.float32)),
        err_lc=jnp.ones((4, 10), jnp.float32),
        x_img=jnp.array(rng.random((4, 8, 8, 3)).astype(np.float32)),
    )
    fn = jax.jit(
        lambda batch, key: augment_batch(batch, key, noise_level_img=1.0, noise_level_mag=1.0)
    )
    out = fn(b, jax.random.PRNGKey(0))
    assert out.x_lc.shape == b.x_lc.shape
    assert not np.allclose(np.asarray(out.x_lc), np.asarray(b.x_lc))
    # rotation can be disabled for deterministic eval
    out2 = augment_batch(b, jax.random.PRNGKey(0), rotate_images=False)
    np.testing.assert_allclose(np.asarray(out2.x_img), np.asarray(b.x_img))


def _band_padding_mask(rng, b=8, nband=2, bandsize=10):
    pm = np.zeros((b, nband * bandsize), dtype=bool)
    for i in range(b):
        for k in range(nband):
            n_obs = rng.integers(4, bandsize + 1)
            pm[i, k * bandsize : k * bandsize + n_obs] = True
    return jnp.array(pm)


def test_contiguous_span_mask_properties(rng):
    pm = _band_padding_mask(rng)
    keep, pred = contiguous_span_mask(pm, 2, 0.3, jax.random.PRNGKey(0))
    keep, pred = np.asarray(keep), np.asarray(pred)
    pmn = np.asarray(pm)
    # disjoint, and union = padding mask
    assert not (keep & pred).any()
    assert ((keep | pred) == pmn).all()
    # per band: pred is contiguous and ~f_mask of the valid length
    for i in range(pm.shape[0]):
        for k in range(2):
            band_pred = pred[i, k * 10 : (k + 1) * 10]
            n_obs = pmn[i, k * 10 : (k + 1) * 10].sum()
            idx = np.where(band_pred)[0]
            assert len(idx) == int(n_obs * 0.3)
            if len(idx) > 1:
                assert (np.diff(idx) == 1).all()


def test_random_subset_mask_properties(rng):
    pm = _band_padding_mask(rng)
    keep, pred = random_subset_mask(pm, 0.25, jax.random.PRNGKey(1))
    keep, pred = np.asarray(keep), np.asarray(pred)
    pmn = np.asarray(pm)
    assert not (keep & pred).any()
    assert ((keep | pred) == pmn).all()
    for i in range(pm.shape[0]):
        assert pred[i].sum() == int(pmn[i].sum() * 0.25)
