"""On-device, jitted data augmentation.

Replaces the reference's ``NoisyDataLoader`` (src/dataloader.py:88-287),
which re-implements the same three augmentations seven times (once per
modality combination) in per-batch Python — including a per-image Python
rotation loop. Here each augmentation is a pure function of (arrays, PRNG
key); they fuse into the surrounding XLA program, so augmentation costs a few
elementwise ops + one gather on the TPU instead of a host round-trip.

Semantics preserved:
  * sequence noise: ``x + N(0,1) * err * noise_level`` (dataloader.py:124);
  * image noise: uniform in ``+- noise_level_img * std(batch)``
    (dataloader.py:95-99) — std over the WHOLE batch, as in the reference;
  * image rotation: per-image random multiple of 90 degrees
    (dataloader.py:103-114).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .batching import Batch


def noise_from_error(x: jax.Array, err: jax.Array, level, key: jax.Array) -> jax.Array:
    """Gaussian noise scaled by the per-point measurement error."""
    return x + jax.random.normal(key, x.shape, x.dtype) * err * level


def image_uniform_noise(img: jax.Array, level, key: jax.Array) -> jax.Array:
    """Uniform noise in +-(level * std(img_batch)), std over the full batch."""
    noise_range = level * jnp.std(img)
    u = jax.random.uniform(key, img.shape, img.dtype, minval=-1.0, maxval=1.0)
    return img + u * noise_range


def random_rot90(img: jax.Array, key: jax.Array) -> jax.Array:
    """Rotate each NHWC image by an independent random multiple of 90 deg.

    H == W is assumed (ZTF host cutouts are square), so all four rotations
    share one static shape and the per-sample branch is a ``lax.switch``.
    """
    k = jax.random.randint(key, (img.shape[0],), 0, 4)

    def rot(one_k, one_img):
        branches = [lambda im, i=i: jnp.rot90(im, k=i, axes=(0, 1)) for i in range(4)]
        return jax.lax.switch(one_k, branches, one_img)

    return jax.vmap(rot)(k, img)


def augment_batch(
    batch: Batch,
    key: jax.Array,
    noise_level_img: float = 0.0,
    noise_level_mag: float = 0.0,
    rotate_images: bool = True,
) -> Batch:
    """Apply the reference's full augmentation recipe to whatever modalities
    are present. Zero levels short-circuit statically (no wasted ops when the
    no-augmentation loaders of script_wandb.py:81-122 are requested).

    Note ``rotate_images``: the reference's NoisyDataLoader rotates images by
    a random multiple of 90 degrees whenever images are present, EVEN in its
    "no augmentation" configuration (noise levels 0) — the noise level only
    scales the additive term (dataloader.py:95-114). Default preserves that;
    pass False for genuinely deterministic evaluation batches.
    """
    k_img_noise, k_img_rot, k_lc, k_sp = jax.random.split(key, 4)
    updates = {}
    if batch.x_img is not None:
        img = batch.x_img
        if noise_level_img:
            img = image_uniform_noise(img, noise_level_img, k_img_noise)
        if rotate_images:
            img = random_rot90(img, k_img_rot)
        if img is not batch.x_img:
            updates["x_img"] = img
    if batch.x_lc is not None and noise_level_mag:
        updates["x_lc"] = noise_from_error(
            batch.x_lc, batch.err_lc, noise_level_mag, k_lc
        )
    if batch.x_sp is not None and noise_level_mag:
        updates["x_sp"] = noise_from_error(
            batch.x_sp, batch.err_sp, noise_level_mag, k_sp
        )
    return batch.replace(**updates) if updates else batch


# ---------------------------------------------------------------------------
# Masked-pretraining masks (reference: src/models_pretraining.py:17-98)
# ---------------------------------------------------------------------------


def random_subset_mask(
    padding_mask: jax.Array, f_mask: float, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Randomly mask ``f_mask`` of the VALID positions (non-contiguous).

    Vectorized equivalent of ``get_random_mask``
    (src/models_pretraining.py:17-55): per sample, pick
    ``floor(n_obs * f_mask)`` valid positions uniformly without replacement.
    Implementation: rank i.i.d. uniforms over valid positions; the smallest
    ``n_mask`` ranks are masked — an exchangeable uniform subset.

    Returns (mask_keep, mask_pred): mask_keep marks valid positions the model
    may see; mask_pred marks valid positions held out for prediction.
    """
    pm = padding_mask.astype(bool)
    n_obs = pm.sum(axis=1)  # (B,)
    n_mask = (n_obs * f_mask).astype(jnp.int32)
    u = jax.random.uniform(key, pm.shape)
    u = jnp.where(pm, u, jnp.inf)  # padded positions never selected
    ranks = jnp.argsort(jnp.argsort(u, axis=1), axis=1)  # rank of each entry
    pred = (ranks < n_mask[:, None]) & pm
    keep = pm & ~pred
    return keep, pred


def contiguous_span_mask(
    padding_mask: jax.Array, nband: int, f_mask: float, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Mask one random contiguous span per band (the MAE-style objective).

    Vectorized equivalent of ``get_continous_random_mask``
    (src/models_pretraining.py:58-98): in each band block of the band-blocked
    layout, draw span length ``floor(n_obs_band * f_mask)`` and a start
    uniform in [0, n_obs_band - span] (valid observations are a contiguous
    prefix of each band block after ingest padding).

    Returns (mask_keep, mask_pred) as above.
    """
    pm = padding_mask.astype(bool)
    b, t = pm.shape
    bandsize = t // nband
    bands = pm.reshape(b, nband, bandsize)
    n_obs = bands.sum(axis=2)  # (B, nband)
    span = (n_obs * f_mask).astype(jnp.int32)
    # start ~ Uniform{0, ..., n_obs - span}; randint needs static bounds so
    # draw a float and scale by the (traced) range, matching randint(a, b)
    # inclusive semantics of the reference's random.randint.
    u = jax.random.uniform(key, (b, nband))
    start = jnp.floor(u * (n_obs - span + 1).astype(jnp.float32)).astype(jnp.int32)
    pos = jnp.arange(bandsize)[None, None, :]
    in_span = (pos >= start[..., None]) & (pos < (start + span)[..., None])
    pred = (in_span & bands).reshape(b, t)
    keep = pm & ~pred
    return keep, pred
