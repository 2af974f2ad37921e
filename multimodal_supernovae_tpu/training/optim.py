"""Optimizers and parameter-freezing as optax transforms.

The reference trains everything with ``torch.optim.RAdam(lr, weight_decay)``
(src/models_multimodal.py:306-310) and, for masked pretraining, a StepLR
schedule (src/models_pretraining.py:167-189). Functional equivalents:

  * RAdam: ``optax.radam``. torch's ``weight_decay`` is L2-style (adds
    ``wd * param`` to the gradient BEFORE the adaptive update), so we chain
    ``optax.add_decayed_weights`` ahead of the radam transform — not
    AdamW-style decoupled decay.
  * StepLR(step_size, gamma): a staircase ``optax.exponential_decay`` keyed
    on epoch boundaries.
  * Backbone freezing (``requires_grad=False`` surgery in
    models_multimodal.py:789-831): an optax ``masked``/``set_to_zero``
    partition built from parameter-path predicates — e.g. freeze a sequence
    encoder except its final ``projection`` layer.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import optax


def build_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    step_size: Optional[int] = None,
    gamma: Optional[float] = None,
    steps_per_epoch: int = 1,
    freeze: Optional[Callable[[Tuple[str, ...]], bool]] = None,
    params: Any = None,
) -> optax.GradientTransformation:
    """RAdam with torch-style L2 weight decay, optional StepLR schedule and
    optional parameter freezing.

    Args:
      lr: base learning rate.
      weight_decay: L2 coefficient (0 disables the decay transform).
      step_size / gamma: StepLR epoch interval and decay factor (both or
        neither).
      steps_per_epoch: converts the epoch-based StepLR to step counts.
      freeze: predicate over parameter paths (tuples of str keys); True =>
        parameter receives zero updates. Requires ``params`` to build the
        mask pytree.
    """
    if step_size is not None and gamma is not None:
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=step_size * steps_per_epoch,
            decay_rate=gamma,
            staircase=True,
        )
    else:
        schedule = lr

    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.radam(learning_rate=schedule))
    tx = optax.chain(*chain)

    if freeze is not None:
        if params is None:
            raise ValueError("freezing requires the params pytree")
        mask = freeze_mask(params, freeze)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            mask,
        )
    else:
        # Run the (elementwise) optimizer math over ONE concatenated vector
        # instead of per-leaf: with O(300) small leaves the per-leaf RAdam
        # kernels dominated the whole train step on TPU (12 of 21 ms at
        # B=256 — benchmarks/ablate_results.json); flattening makes the
        # update a handful of fused full-vector ops. Exactly
        # semantics-preserving for elementwise transforms.
        #
        # CHECKPOINT FORMAT NOTE: flattening changes the opt_state pytree, so
        # checkpoints saved before this change (per-leaf RAdam state) cannot
        # resume in place; frozen (multi_transform) runs keep per-leaf state
        # (optax.flatten cannot see through MaskedNode placeholders), so the
        # two branches intentionally produce different opt_state structures.
        # CheckpointManager.restore reports this break explicitly.
        tx = optax.flatten(tx)
    return tx


def freeze_mask(params: Any, frozen_pred: Callable[[Tuple[str, ...]], bool]):
    """Label each param 'frozen' or 'train' by its path predicate."""

    def label(path, _):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return "frozen" if frozen_pred(keys) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_encoder_except_projection(encoder_name: str):
    """Freeze every parameter under ``encoder_name`` except its final
    ``projection`` Dense — the reference's masked-pretrain transfer recipe
    (``load_pretrain_lc_model``, models_multimodal.py:789-795)."""

    def pred(path: Tuple[str, ...]) -> bool:
        return encoder_name in path and "projection" not in path

    return pred


def freeze_encoders_except_projection(encoder_names: Sequence[str]):
    """Same, for several encoders (``load_pretrain_clip_model`` freezes both
    sequence encoders, models_multimodal.py:819-831)."""

    names = set(encoder_names)

    def pred(path: Tuple[str, ...]) -> bool:
        return bool(names.intersection(path)) and "projection" not in path

    return pred
