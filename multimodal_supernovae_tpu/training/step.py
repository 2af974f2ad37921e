"""Jitted train/eval steps and whole-epoch scans.

TPU-first structure: the dataset lives on device (Batch of full arrays), an
epoch is a ``lax.scan`` over a precomputed (steps, batch_size) index plan,
and each scan step gathers its batch, augments it, computes loss/grads and
applies the optimizer — all inside ONE jitted program per epoch. The host
only supplies the index plan and reads back epoch-level metrics, which
matters doubly here because device dispatch crosses a network tunnel.

The reference's equivalent is Lightning's Python batch loop over
``NoisyDataLoader`` (SURVEY.md §3.1 hot loop).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.augment import augment_batch
from ..data.batching import Batch
from .state import TrainState


def make_loss_computer(
    model,
    gather_axis: Optional[str] = None,
):
    """Wrap ``model.loss_fn`` into a pure function of (params, batch_stats,
    batch, keys) handling the mutable batch_stats collection."""

    def compute(params, batch_stats, batch: Batch, dropout_key, loss_key, train):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (batch_stats is not None and train) else False
        rngs = {"dropout": dropout_key} if train else None
        out = model.apply(
            variables,
            batch,
            train=train,
            key=loss_key,
            gather_axis=gather_axis,
            method=model.loss_fn,
            mutable=mutable,
            rngs=rngs,
        )
        if mutable:
            (loss, aux), updated = out
            new_stats = updated.get("batch_stats", batch_stats)
        else:
            loss, aux = out
            new_stats = batch_stats
        return loss, aux, new_stats

    return compute


def make_train_step(
    model,
    gather_axis: Optional[str] = None,
    noise_level_img: float = 0.0,
    noise_level_mag: float = 0.0,
    rotate_images: bool = True,
) -> Callable:
    """One optimizer step: augment -> loss -> grad -> update.

    Returns ``train_step(state, batch, key) -> (state, loss)``.
    """
    compute = make_loss_computer(model, gather_axis)

    def train_step(state: TrainState, batch: Batch, key) -> Tuple[TrainState, jax.Array]:
        aug_key, dropout_key, loss_key = jax.random.split(key, 3)
        batch = augment_batch(
            batch, aug_key, noise_level_img, noise_level_mag, rotate_images
        )

        def loss_of(params):
            loss, aux, new_stats = compute(
                params, state.batch_stats, batch, dropout_key, loss_key, True
            )
            return loss, (aux, new_stats)

        (loss, (_, new_stats)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss

    return train_step


def make_epoch_runner(
    model,
    gather_axis: Optional[str] = None,
    noise_level_img: float = 0.0,
    noise_level_mag: float = 0.0,
    rotate_images: bool = True,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Whole-epoch training as one jitted scan.

    ``run_epoch(state, data, index_plan, key) -> (state, per_step_losses)``
    where ``data`` is the device-resident full-dataset Batch and
    ``index_plan`` is (steps, batch_size) int32. Different epoch lengths
    retrace, so the trainer keeps plans a fixed shape across epochs.
    ``jit=False`` returns the raw function (training/ensemble.py vmaps it
    over a stacked member axis before jitting).
    """
    step = make_train_step(
        model, gather_axis, noise_level_img, noise_level_mag, rotate_images
    )

    def run_epoch(state: TrainState, data: Batch, index_plan, key):
        def body(carry, xs):
            state, key = carry
            idx = xs
            key, sub = jax.random.split(key)
            state, loss = step(state, data.take(idx), sub)
            return (state, key), loss

        (state, _), losses = jax.lax.scan(body, (state, key), index_plan)
        return state, losses

    if not jit:
        return run_epoch
    return jax.jit(run_epoch, donate_argnums=(0,) if donate else ())


def make_eval_runner(
    model,
    gather_axis: Optional[str] = None,
    rotate_images: bool = True,
    jit: bool = True,
) -> Callable:
    """Whole-validation-epoch scan: per-step loss plus whatever auxiliary
    outputs the model's loss_fn emits (embeddings / preds / logits), stacked
    over steps. ``key`` feeds stochastic objectives (masked pretraining
    validates with random masks, like the reference).

    ``rotate_images`` reproduces the reference's validation semantics: its
    val loaders are NoisyDataLoaders at noise level 0, and NoisyDataLoader
    rotates images by a random multiple of 90 degrees UNCONDITIONALLY
    (src/dataloader.py:103-114; val loaders built at script_wandb.py:94) —
    so reference val_loss/AUC for image runs is computed on rotated images.
    Default True matches the reference; pass False for deterministic eval.
    No-op for batches without images."""
    compute = make_loss_computer(model, gather_axis)

    def run_eval(state: TrainState, data: Batch, index_plan, key):
        def body(key, idx):
            key, aug_key, sub = jax.random.split(key, 3)
            batch = augment_batch(
                data.take(idx), aug_key, rotate_images=rotate_images
            )
            loss, aux, _ = compute(
                state.params, state.batch_stats, batch, None, sub, False
            )
            return key, (loss, aux)

        _, (losses, auxes) = jax.lax.scan(body, key, index_plan)
        return losses, auxes

    if not jit:
        return run_eval
    return jax.jit(run_eval)
