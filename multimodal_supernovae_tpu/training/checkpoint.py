"""Checkpointing: orbax state + the reference's sidecar contract.

A run directory contains:

  * ``config.yaml``        — the flattened per-run config (the reference dumps
                             wandb.config the same way, script_wandb.py:70-72);
  * ``train_filenames.txt`` / ``val_filenames.txt`` — the exact split
                             manifests, consumed at evaluation time to rebuild
                             the split (script_wandb.py:58-67,
                             models_multimodal.py:734-743);
  * ``ckpt_best/``          — orbax, top-k by the monitored metric
                             (ModelCheckpoint save_top_k=2 equivalent,
                             script_wandb.py:197-219);
  * ``ckpt_last/``          — orbax, the latest state (save_last=True).

Cross-model weight surgery (the reference's state-dict manipulation,
models_multimodal.py:761-831) becomes pytree grafting:

  * ``graft_masked_pretrain_into_clip``: the masked pretrainer's ``net``
    subtree drops into the CLIP model's ``lightcurve_encoder`` (the
    ``net.``-prefix strip);
  * ``merge_params_nonstrict``: copy every leaf whose path exists in both
    trees (``load_state_dict(strict=False)``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


def save_run_sidecars(
    run_dir: str,
    config: Dict[str, Any],
    train_filenames: Optional[Sequence[str]] = None,
    val_filenames: Optional[Sequence[str]] = None,
) -> None:
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(config), f)
    if train_filenames is not None:
        np.savetxt(
            os.path.join(run_dir, "train_filenames.txt"),
            np.asarray(train_filenames, dtype=str),
            fmt="%s",
        )
    if val_filenames is not None:
        np.savetxt(
            os.path.join(run_dir, "val_filenames.txt"),
            np.asarray(val_filenames, dtype=str),
            fmt="%s",
        )


def load_run_sidecars(run_dir: str):
    with open(os.path.join(run_dir, "config.yaml")) as f:
        config = yaml.safe_load(f)
    def read_names(name):
        path = os.path.join(run_dir, name)
        if not os.path.exists(path):
            return None
        return [l.strip() for l in open(path) if l.strip()]
    return config, read_names("train_filenames.txt"), read_names("val_filenames.txt")


class CheckpointManager:
    """Best-k + last checkpointing of {params, batch_stats, opt_state}."""

    def __init__(
        self,
        run_dir: str,
        monitor: str = "val_loss",
        mode: str = "min",
        keep_best: int = 2,
    ):
        self.run_dir = run_dir
        self.monitor = monitor
        sign = 1.0 if mode == "max" else -1.0
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_best,
            best_fn=lambda metrics: sign * metrics[monitor],
            best_mode="max",
        )
        self._best = ocp.CheckpointManager(
            os.path.join(os.path.abspath(run_dir), "ckpt_best"), options=options
        )
        self._last = ocp.CheckpointManager(
            os.path.join(os.path.abspath(run_dir), "ckpt_last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )

    @staticmethod
    def _state_dict(state) -> Dict[str, Any]:
        d = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        if state.batch_stats is not None:
            d["batch_stats"] = state.batch_stats
        return d

    def save(self, epoch: int, state, metrics: Dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items() if np.isfinite(v)}
        sd = self._state_dict(state)
        if self.monitor in metrics:
            self._best.save(
                epoch, args=ocp.args.StandardSave(sd), metrics=metrics
            )
        self._last.save(epoch, args=ocp.args.StandardSave(sd))

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def best_epoch(self) -> Optional[int]:
        self.wait()
        return self._best.best_step()

    def try_restore_last(self, state):
        """Resume support: restore the latest ckpt_last into ``state``.
        Returns (state, epoch) or None when no checkpoint exists yet."""
        self.wait()
        epoch = self._last.latest_step()
        if epoch is None:
            return None
        return self.restore(state, epoch=epoch, which="last"), int(epoch)

    def restore(self, state, epoch: Optional[int] = None, which: str = "best"):
        """Restore into the (template) TrainState; epoch None = best/latest."""
        self.wait()
        mgr = self._best if which == "best" else self._last
        if epoch is None:
            epoch = mgr.best_step() if which == "best" else mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(
                f"no '{which}' checkpoint exists under {self.run_dir} — "
                "nothing to restore."
            )
        template = self._state_dict(state)
        try:
            restored = mgr.restore(
                epoch, args=ocp.args.StandardRestore(template)
            )
        except (ValueError, KeyError) as e:
            # Only rebrand genuine STRUCTURE mismatches; let unrelated orbax
            # failures (missing step, corrupt metadata, interrupted write)
            # surface as themselves instead of sending the operator chasing
            # a format migration that never happened.
            msg = str(e).lower()
            if not any(w in msg for w in
                       ("structure", "tree", "custom_node", "mismatch")):
                raise
            # FORMAT BREAK (round 2): unfrozen runs now wrap the optimizer in
            # ``optax.flatten`` (training/optim.py), so opt_state is a single
            # concatenated vector instead of per-leaf RAdam moments.
            # Checkpoints written before that change (or with a different
            # freeze partition) have a different opt_state tree and cannot
            # resume in place — surface the cause instead of orbax's raw
            # structure diff.
            raise RuntimeError(
                f"checkpoint at epoch {epoch} does not match the current "
                "TrainState structure. Likely causes: it predates the "
                "optax.flatten optimizer-state format (round 2) or was saved "
                "with a different freeze partition. Params remain portable: "
                "restore them with models.factory/load_params and start a "
                "fresh optimizer instead of resume=True."
            ) from e
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
        )

    def close(self):
        self._best.close()
        self._last.close()


class StreamCursor:
    """Shard-granular resume point for ``Trainer.fit_sharded``.

    The streaming trainer's epoch can be arbitrarily long (a >HBM corpus),
    so epoch-boundary checkpoints alone lose up to a whole epoch on
    preemption. After every shard's scan the cursor saves the train state
    plus the in-flight epoch's bookkeeping — (epoch, shard position, the
    per-shard loss rows so far) — under ``<run_dir>/ckpt_cursor``. Resume
    replays the host RNG/key streams up to the cursor and continues with
    the next shard; the continuation is bit-identical to an uninterrupted
    run (tests/test_streaming.py).

    The loss rows ride INSIDE the orbax payload (fixed (n_shards,
    steps_per_shard) f32, NaN-padded) so state and bookkeeping can never
    tear: one atomic save holds both.
    """

    def __init__(self, run_dir: str):
        self._mgr = ocp.CheckpointManager(
            os.path.join(os.path.abspath(run_dir), "ckpt_cursor"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )

    @staticmethod
    def _payload(state, epoch, shard_pos, losses):
        return {
            "state": CheckpointManager._state_dict(state),
            "cursor": {
                "epoch": np.asarray(epoch, dtype=np.int64),
                "shard_pos": np.asarray(shard_pos, dtype=np.int64),
            },
            "losses": np.asarray(losses, dtype=np.float32),
        }

    def save(self, gstep: int, state, epoch: int, shard_pos: int,
             losses: np.ndarray) -> None:
        self._mgr.save(
            gstep,
            args=ocp.args.StandardSave(
                self._payload(state, epoch, shard_pos, losses)
            ),
        )

    def try_restore(self, state, n_shards: int, steps_per_shard: int):
        """Returns (state, epoch, shard_pos, losses) or None."""
        self._mgr.wait_until_finished()
        gstep = self._mgr.latest_step()
        if gstep is None:
            return None
        template = self._payload(
            state, 0, 0, np.zeros((n_shards, steps_per_shard), np.float32)
        )
        restored = self._mgr.restore(
            gstep, args=ocp.args.StandardRestore(template)
        )
        sd = restored["state"]
        state = state.replace(
            params=sd["params"], opt_state=sd["opt_state"], step=sd["step"],
            batch_stats=sd.get("batch_stats", state.batch_stats),
        )
        return (
            state,
            int(restored["cursor"]["epoch"]),
            int(restored["cursor"]["shard_pos"]),
            np.asarray(restored["losses"]),
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


# -- params-only export/import (for eval & transfer) -------------------------


def save_params(path: str, params: Any, batch_stats: Any = None) -> None:
    ckpt = ocp.StandardCheckpointer()
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckpt.save(os.path.abspath(path), payload)
    ckpt.wait_until_finished()
    ckpt.close()


def load_params(path: str, template: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    out = ckpt.restore(os.path.abspath(path), template)
    ckpt.close()
    return out


# -- weight surgery ----------------------------------------------------------


def merge_params_nonstrict(target: Dict, source: Dict) -> Dict:
    """Copy every source leaf whose path exists in target with a matching
    shape — ``load_state_dict(strict=False)`` semantics
    (models_multimodal.py:817)."""
    target = jax.tree_util.tree_map(lambda x: x, target)  # deep-ish copy

    def walk(dst, src):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                walk(dst[k], v)
            elif not isinstance(v, dict) and not isinstance(dst[k], dict):
                if getattr(dst[k], "shape", None) == getattr(v, "shape", None):
                    dst[k] = v
        return dst

    return walk(target, source)


def graft_masked_pretrain_into_clip(
    clip_params: Dict, masked_params: Dict
) -> Dict:
    """Drop the masked pretrainer's encoder (``net`` subtree) into the CLIP
    model's ``lightcurve_encoder`` — the reference's ``net.``-prefix-strip
    transfer (models_multimodal.py:779-787)."""
    out = jax.tree_util.tree_map(lambda x: x, clip_params)
    out["lightcurve_encoder"] = merge_params_nonstrict(
        out["lightcurve_encoder"], masked_params["net"]
    )
    return out
