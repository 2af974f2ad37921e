"""The training loop: jitted scanned epochs, early stopping, checkpointing.

Replaces the reference's PyTorch-Lightning ``Trainer`` + callbacks stack
(script_wandb.py:229-243, SURVEY.md L3) with an explicit loop around ONE
jitted program per epoch (training/step.py):

  host                         device (TPU)
  ----                         ------------
  epoch index plan      ->     lax.scan over steps:
  (shuffled, wrapped)            gather batch from HBM-resident dataset
                                 -> jitted augmentation
                                 -> loss / grad / RAdam update
  epoch metrics         <-     per-step losses, eval aux (embeddings/preds)

Per-epoch host work is a few scalars: metric computation (retrieval AUC, R2,
macro-F1 — themselves jitted), early-stopping bookkeeping, orbax
checkpointing and JSONL logging. This mirrors what LossTrackingCallback,
ModelCheckpoint and EarlyStopping did for the reference
(src/utils.py:164-209, script_wandb.py:197-243).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import ArrayDataset, Batch, epoch_indices
from ..ops.metrics import macro_f1, r2_score, retrieval_auc
from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import replicated, shard_params
from .checkpoint import CheckpointManager, save_run_sidecars
from .optim import build_optimizer
from .state import TrainState
from .step import make_epoch_runner, make_eval_runner
from ..utils.logging import MetricsLogger


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 10
    batch_size: int = 32
    lr: float = 1e-4
    weight_decay: float = 0.0
    patience: int = 10**9  # early-stopping patience (epochs)
    seed: int = 0
    noise_level_img: float = 0.0
    noise_level_mag: float = 0.0
    rotate_images: bool = True
    # lr schedule (masked pretraining's StepLR)
    step_size: Optional[int] = None
    gamma: Optional[float] = None
    # monitored metric for checkpoint/early-stop: None = auto by task
    monitor: Optional[str] = None
    mode: Optional[str] = None  # 'min' | 'max'
    keep_best: int = 2
    log_every_epochs: int = 1
    eval_every_epochs: int = 1


def _fit_end_barrier() -> None:
    """Cross-process sync before ``fit`` returns in multi-host runs.

    Process 0 does strictly more exit work than the others (orbax
    wait/close plus sidecar/metric/summary writes). Without a barrier a
    fast rank can reach interpreter exit — tearing down the coordination
    service — while rank 0 still writes, which surfaces as a
    shutdown-barrier DEADLINE_EXCEEDED on a loaded host (observed in the
    round-2 review on tests/test_multiprocess.py::test_two_process_
    checkpointing). Single-process runs skip it entirely."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mmsn:fit_end")


class Trainer:
    """Config-driven trainer for any module exposing the uniform
    ``loss_fn(batch, train, key, gather_axis)`` interface."""

    def __init__(
        self,
        model,
        task: str,  # 'contrastive' | 'regression' | 'classification' | 'masked'
        cfg: TrainerConfig,
        run_dir: Optional[str] = None,
        mesh=None,
        freeze=None,
        use_wandb: bool = False,
        n_classes: int = 5,
    ):
        self.model = model
        self.task = task
        self.cfg = cfg
        self.run_dir = run_dir
        self.mesh = mesh
        self.freeze = freeze
        self.n_classes = n_classes
        self.use_wandb = use_wandb
        monitor, mode = self._default_monitor()
        self.monitor = cfg.monitor or monitor
        self.mode = cfg.mode or mode
        # set from the training set size before init_state so epoch-based lr
        # schedules (StepLR) convert to optimizer steps correctly
        self._steps_per_epoch = 1

    def set_dataset_size(self, n_train: int) -> None:
        self._steps_per_epoch = max(1, -(-n_train // self.cfg.batch_size))

    def _default_monitor(self) -> Tuple[str, str]:
        # script_wandb.py:197-228: classification monitors f1_val (max),
        # everything else val_loss (min).
        if self.task == "classification":
            return "f1_val", "max"
        return "val_loss", "min"

    # -- state ---------------------------------------------------------------

    def init_state(self, example_batch: Batch) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.seed)
        variables = self.model.init(key, example_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        tx = build_optimizer(
            lr=self.cfg.lr,
            weight_decay=self.cfg.weight_decay,
            step_size=self.cfg.step_size,
            gamma=self.cfg.gamma,
            steps_per_epoch=self._steps_per_epoch,
            freeze=self.freeze,
            params=params,
        )
        if self.mesh is not None:
            params = shard_params(params, self.mesh)
        return TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx, batch_stats=batch_stats
        )

    # -- data placement ------------------------------------------------------

    def _device_data(self, ds: ArrayDataset) -> Batch:
        sharding = replicated(self.mesh) if self.mesh is not None else None
        return ds.to_device(sharding)

    def _plan_to_device(self, plan: np.ndarray):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.distributed import global_put

            return global_put(
                np.asarray(plan), NamedSharding(self.mesh, P(None, DATA_AXIS))
            )
        return jnp.asarray(plan)

    # -- fit -----------------------------------------------------------------

    def fit(
        self,
        train_ds: ArrayDataset,
        val_ds: ArrayDataset,
        config_dump: Optional[Dict[str, Any]] = None,
        state: Optional[TrainState] = None,
        resume: bool = False,
    ) -> Dict[str, Any]:
        """Train. ``resume=True`` restores the latest ckpt_last state in
        ``run_dir`` (params, optimizer state, epoch counter) and continues —
        the recovery path the reference leaves manual (SURVEY.md §5.3)."""
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        root_key = jax.random.PRNGKey(cfg.seed + 1)

        # Multi-host: every process participates in orbax saves (required
        # for sharded-state checkpoints), but only process 0 writes the
        # sidecars/metrics files — they live on a shared or per-host FS.
        is_main = jax.process_index() == 0
        if self.run_dir:
            if is_main:
                save_run_sidecars(
                    self.run_dir,
                    config_dump or dataclasses.asdict(cfg),
                    train_ds.filenames,
                    val_ds.filenames,
                )
            logger = (MetricsLogger(self.run_dir, use_wandb=self.use_wandb)
                      if is_main else None)
            ckpts = CheckpointManager(
                self.run_dir, self.monitor, self.mode, cfg.keep_best
            )
        else:
            logger, ckpts = None, None

        self.set_dataset_size(len(train_ds))
        train_data = self._device_data(train_ds)
        val_data = self._device_data(val_ds)
        example = train_data.take(jnp.arange(cfg.batch_size) % len(train_ds))
        if state is None:
            state = self.init_state(example)
        start_epoch = 0
        if resume and ckpts is not None:
            restored = ckpts.try_restore_last(state)
            if restored is not None:
                state, start_epoch = restored
                start_epoch += 1
                # advance the host RNGs past the completed epochs so the
                # resumed run sees fresh shuffles/augmentation keys
                for _ in range(start_epoch):
                    rng.permutation(len(train_ds))
                    root_key, _, _ = jax.random.split(root_key, 3)

        run_epoch = make_epoch_runner(
            self.model,
            gather_axis=None,
            noise_level_img=cfg.noise_level_img,
            noise_level_mag=cfg.noise_level_mag,
            rotate_images=cfg.rotate_images,
        )
        run_eval = make_eval_runner(
            self.model, gather_axis=None, rotate_images=cfg.rotate_images
        )

        # Fixed-shape eval plan (sequential, tail repeats the last sample,
        # trimmed after flattening).
        val_plan = self._plan_to_device(
            epoch_indices(len(val_ds), cfg.batch_size, shuffle=False, pad="repeat_last")
        )
        n_val = len(val_ds)

        history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
        metric_rows: List[Dict[str, float]] = []
        best = {"value": None, "epoch": -1}
        since_best = 0
        t_start = time.time()
        samples_per_epoch = None

        epoch = start_epoch - 1  # when already complete, no epochs run
        for epoch in range(start_epoch, cfg.epochs):
            plan = epoch_indices(
                len(train_ds), cfg.batch_size, rng=rng, shuffle=True, pad="wrap"
            )
            samples_per_epoch = plan.size
            root_key, ekey, vkey = jax.random.split(root_key, 3)
            t0 = time.time()
            state, losses = run_epoch(state, train_data, self._plan_to_device(plan), ekey)
            train_loss = float(jnp.mean(losses))
            if not np.isfinite(train_loss):
                # failure detection: surface divergence instead of burning
                # the remaining epochs (the reference would train on)
                if logger:
                    logger.log({"epoch": epoch, "train_loss": train_loss,
                                "aborted": "non-finite loss"}, step=epoch)
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch}; last finite "
                    f"epoch metrics: {metric_rows[-1] if metric_rows else None}"
                )
            step_time = (time.time() - t0) / plan.shape[0]
            history["train_loss"].append(train_loss)

            metrics: Dict[str, float] = {
                "epoch": epoch,
                "train_loss": train_loss,
                "step_time_s": step_time,
                "samples_per_s": plan.shape[1] / max(step_time, 1e-9),
            }

            if epoch % cfg.eval_every_epochs == 0:
                val_losses, aux = run_eval(state, val_data, val_plan, vkey)
                metrics["val_loss"] = float(jnp.mean(val_losses))
                history["val_loss"].append(metrics["val_loss"])
                metrics.update(self._task_metrics(aux, val_ds, n_val))

            metric_rows.append(metrics)
            if logger:
                logger.log(metrics, step=epoch)
            if ckpts:
                ckpts.save(epoch, state, metrics)

            # early stopping on the monitored metric
            if self.monitor in metrics:
                current = metrics[self.monitor]
                better = (
                    best["value"] is None
                    or (self.mode == "min" and current < best["value"])
                    or (self.mode == "max" and current > best["value"])
                )
                if better:
                    best = {"value": current, "epoch": epoch}
                    since_best = 0
                else:
                    since_best += 1
                if since_best >= cfg.patience:  # Lightning wait_count >= patience
                    break

        result = {
            "state": state,
            "history": history,
            "metric_rows": metric_rows,
            "best": best,
            "epochs_run": epoch + 1,
            "wall_time_s": time.time() - t_start,
        }
        if ckpts:
            ckpts.wait()
            result["best_ckpt_epoch"] = ckpts.best_epoch()
        if logger:
            # Run summaries mirroring script_wandb.py:248-253.
            summary = {
                f"best_{self.monitor}": best["value"],
                "best_epoch": best["epoch"],
                "best_ckpt_epoch": result.get("best_ckpt_epoch"),
            }
            if history["val_loss"]:
                summary["best_val_loss"] = float(np.min(history["val_loss"]))
            aucs = [m["AUC_val"] for m in metric_rows if "AUC_val" in m]
            if aucs:
                summary["best_auc"] = float(np.max(aucs))
            logger.set_summary(**summary)
            logger.close()
        if ckpts:
            ckpts.close()
        _fit_end_barrier()
        return result

    # -- sharded (streaming) fit ----------------------------------------------

    def fit_sharded(
        self,
        train_sds,  # data.streaming.ShardedDataset
        val_ds: ArrayDataset,
        config_dump: Optional[Dict[str, Any]] = None,
        state: Optional[TrainState] = None,
        resume: bool = False,
    ) -> Dict[str, Any]:
        """Train over a sharded cache too large to materialise: per epoch,
        shuffled shard order, at most TWO shards resident in HBM at a time
        (the next shard's upload overlaps the current shard's compute; the
        pipeline degrades to one-resident when two don't fit), the same
        jitted epoch scan per shard (data/streaming.py). Eval/checkpoint/
        early-stop cadence matches ``fit``; validation stays in-memory.

        ``resume=True`` restores the latest SHARD-granular cursor
        (``ckpt_cursor`` — state + epoch/shard position + the in-flight
        epoch's losses, saved after every shard's scan) and continues from
        the next shard, replaying the host RNG/key streams so the
        continuation is bit-identical to an uninterrupted run. Streaming
        epochs over a >HBM corpus can be arbitrarily long, so preemption
        recovery here must be finer than ``fit``'s epoch boundary."""
        from ..data.streaming import shard_epoch_schedule
        from .checkpoint import StreamCursor

        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        root_key = jax.random.PRNGKey(cfg.seed + 1)

        is_main = jax.process_index() == 0
        if self.run_dir:
            if is_main:
                save_run_sidecars(
                    self.run_dir, config_dump or dataclasses.asdict(cfg),
                    [f"SHARD{i:05d}x{n}"
                     for i, n in enumerate(train_sds.shard_sizes)],
                    val_ds.filenames or [],
                )
            logger = (MetricsLogger(self.run_dir, use_wandb=self.use_wandb)
                      if is_main else None)
            ckpts = CheckpointManager(
                self.run_dir, self.monitor, self.mode, cfg.keep_best
            )
        else:
            logger, ckpts = None, None

        self.set_dataset_size(len(train_sds))
        val_data = self._device_data(val_ds)
        first_shard = train_sds.load_shard(0)
        shard_bytes = sum(
            np.asarray(v).nbytes for v in first_shard.arrays.values()
        )
        example = first_shard.to_device().take(jnp.arange(cfg.batch_size))
        if state is None:
            state = self.init_state(example)
        del first_shard, example

        # Double-buffering (below) holds TWO shards in HBM at peak.
        # rows_per_shard is a free user parameter, so a cache may legally be
        # sized near the whole of HBM per shard — degrade to the serial
        # one-shard-resident pipeline rather than OOM mid-epoch.
        prefetch = True
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
            if limit:
                prefetch = 2 * shard_bytes <= 0.75 * int(limit)
        except Exception:
            pass  # backend exposes no memory stats (CPU): keep the pipeline
        if not prefetch and is_main:
            print(
                f"fit_sharded: shard size {shard_bytes / 1e9:.2f} GB — two "
                "shards would not fit in HBM; shard prefetch disabled",
                flush=True,
            )

        run_epoch = make_epoch_runner(
            self.model, gather_axis=None,
            noise_level_img=cfg.noise_level_img,
            noise_level_mag=cfg.noise_level_mag,
            rotate_images=cfg.rotate_images,
        )
        run_eval = make_eval_runner(
            self.model, gather_axis=None, rotate_images=cfg.rotate_images
        )
        val_plan = self._plan_to_device(
            epoch_indices(len(val_ds), cfg.batch_size, shuffle=False,
                          pad="repeat_last")
        )
        n_val = len(val_ds)

        n_shards = train_sds.n_shards
        steps_full = -(-train_sds.shard_sizes[0] // cfg.batch_size)
        cursor = (StreamCursor(self.run_dir)
                  if self.run_dir and jax.process_count() == 1 else None)

        history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
        metric_rows: List[Dict[str, float]] = []
        best = {"value": None, "epoch": -1}
        since_best = 0
        t_start = time.time()

        start_epoch = 0
        resume_mid = None  # (schedule, vkey, losses_rows, start_shard)
        if resume and cursor is None and ckpts is not None:
            # multi-host: shard cursors are single-process for now; fall
            # back to fit's epoch-boundary resume from ckpt_last
            restored = ckpts.try_restore_last(state)
            if restored is not None:
                state, start_epoch = restored
                start_epoch += 1
                for _ in range(start_epoch):
                    sch = shard_epoch_schedule(train_sds, cfg.batch_size, rng)
                    root_key, _ = jax.random.split(root_key)
                    for _ in sch:
                        root_key, _ = jax.random.split(root_key)
        if resume and cursor is not None:
            restored = cursor.try_restore(state, n_shards, steps_full)
            if restored is not None:
                state, c_epoch, c_shard, c_losses = restored
                # replay the host RNG/key streams for completed epochs so
                # the resumed run sees exactly the shard orders/shuffles/
                # augmentation keys an uninterrupted run would
                for _ in range(c_epoch):
                    sch = shard_epoch_schedule(train_sds, cfg.batch_size, rng)
                    root_key, _ = jax.random.split(root_key)
                    for _ in sch:
                        root_key, _ = jax.random.split(root_key)
                schedule = shard_epoch_schedule(train_sds, cfg.batch_size, rng)
                root_key, vkey = jax.random.split(root_key)
                for _ in range(c_shard + 1):
                    root_key, _ = jax.random.split(root_key)
                losses_rows = [c_losses[i] for i in range(c_shard + 1)]
                resume_mid = (schedule, vkey, losses_rows, c_shard + 1)
                start_epoch = c_epoch

        epoch = start_epoch - 1
        for epoch in range(start_epoch, cfg.epochs):
            if resume_mid is not None:
                schedule, vkey, epoch_losses, start_shard = resume_mid
                resume_mid = None
            else:
                schedule = shard_epoch_schedule(train_sds, cfg.batch_size, rng)
                root_key, vkey = jax.random.split(root_key)
                epoch_losses = []
                start_shard = 0
            t0 = time.time()
            n_steps = 0
            # Double-buffered shard pipeline: the scan over shard i is
            # dispatched asynchronously, so shard i+1's host->HBM upload
            # overlaps shard i's compute (the host is otherwise idle while
            # the device runs). Two shards resident at peak — guarded above
            # against shards sized over half of HBM.
            remaining = schedule[start_shard:]
            next_data = (
                self._device_data(train_sds.load_shard(remaining[0][0]))
                if prefetch and remaining else None
            )
            for idx, (si, plan) in enumerate(remaining):
                if prefetch:
                    shard_data, next_data = next_data, None
                else:
                    shard_data = self._device_data(train_sds.load_shard(si))
                root_key, ekey = jax.random.split(root_key)
                state, losses = run_epoch(
                    state, shard_data, self._plan_to_device(plan), ekey
                )
                if prefetch and idx + 1 < len(remaining):
                    next_data = self._device_data(
                        train_sds.load_shard(remaining[idx + 1][0])
                    )
                epoch_losses.append(np.asarray(losses))
                n_steps += plan.shape[0]
                del shard_data  # drop the HBM residence before the next shard
                if cursor is not None:
                    shard_pos = start_shard + idx
                    rows = np.full((n_shards, steps_full), np.nan, np.float32)
                    rows[: shard_pos + 1] = np.stack(epoch_losses)
                    cursor.save(
                        epoch * n_shards + shard_pos, state, epoch,
                        shard_pos, rows,
                    )
            train_loss = float(np.mean(np.concatenate(epoch_losses)))
            if not np.isfinite(train_loss):
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch}"
                )
            step_time = (time.time() - t0) / max(n_steps, 1)
            history["train_loss"].append(train_loss)
            metrics: Dict[str, float] = {
                "epoch": epoch,
                "train_loss": train_loss,
                "step_time_s": step_time,
                "samples_per_s": cfg.batch_size / max(step_time, 1e-9),
            }
            if epoch % cfg.eval_every_epochs == 0:
                val_losses, aux = run_eval(state, val_data, val_plan, vkey)
                metrics["val_loss"] = float(jnp.mean(val_losses))
                history["val_loss"].append(metrics["val_loss"])
                metrics.update(self._task_metrics(aux, val_ds, n_val))
            metric_rows.append(metrics)
            if logger:
                logger.log(metrics, step=epoch)
            if ckpts:
                ckpts.save(epoch, state, metrics)
            if self.monitor in metrics:
                current = metrics[self.monitor]
                better = (
                    best["value"] is None
                    or (self.mode == "min" and current < best["value"])
                    or (self.mode == "max" and current > best["value"])
                )
                if better:
                    best = {"value": current, "epoch": epoch}
                    since_best = 0
                else:
                    since_best += 1
                if since_best >= cfg.patience:
                    break

        result = {
            "state": state,
            "history": history,
            "metric_rows": metric_rows,
            "best": best,
            "epochs_run": epoch + 1,
            "wall_time_s": time.time() - t_start,
        }
        if cursor is not None:
            cursor.wait()
            cursor.close()
        if ckpts:
            ckpts.wait()
            result["best_ckpt_epoch"] = ckpts.best_epoch()
            ckpts.close()
        if logger:
            # same run-summary contract as fit (script_wandb.py:248-253);
            # summary.json is also the sweep-level completion marker
            summary = {
                f"best_{self.monitor}": best["value"],
                "best_epoch": best["epoch"],
                "best_ckpt_epoch": result.get("best_ckpt_epoch"),
            }
            if history["val_loss"]:
                summary["best_val_loss"] = float(np.min(history["val_loss"]))
            aucs = [m["AUC_val"] for m in metric_rows if "AUC_val" in m]
            if aucs:
                summary["best_auc"] = float(np.max(aucs))
            logger.set_summary(**summary)
            logger.close()
        _fit_end_barrier()
        return result

    # -- task metrics --------------------------------------------------------

    @staticmethod
    def _to_host(x):
        return _to_host(x)

    def _task_metrics(
        self, aux: Dict[str, Any], val_ds: ArrayDataset, n_val: int
    ) -> Dict[str, float]:
        return compute_task_metrics(
            self.task, aux, val_ds, n_val, self.n_classes
        )


def _to_host(x):
    """Host readback that also works for multi-host sharded outputs:
    replicated/local arrays convert directly; arrays with shards on
    other processes are gathered over DCN first."""
    if (
        isinstance(x, jax.Array)
        and jax.process_count() > 1
        and not (x.is_fully_addressable or x.is_fully_replicated)
    ):
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def compute_task_metrics(
    task: str,
    aux: Dict[str, Any],
    val_ds: ArrayDataset,
    n_val: int,
    n_classes: int = 5,
) -> Dict[str, float]:
    """Per-task validation metrics from the eval scan's stacked aux outputs
    (shared by Trainer and training/ensemble.fit_members)."""
    aux = jax.tree_util.tree_map(_to_host, aux)
    out: Dict[str, float] = {}
    if task == "contrastive":
        embs = [
            e.reshape(-1, e.shape[-1])[:n_val] for e in aux["embeddings"]
        ]
        # AUC_val (single pair) or AUC_val{1..k} (models_multimodal.py:527-556)
        if len(embs) == 2:
            out["AUC_val"] = float(retrieval_auc(embs[0], embs[1]))
        else:
            count = 1
            aucs = []
            for i in range(len(embs) - 1):
                for j in range(i + 1, len(embs)):
                    a = float(retrieval_auc(embs[i], embs[j]))
                    out[f"AUC_val{count}"] = a
                    aucs.append(a)
                    count += 1
            out["AUC_val_mean"] = float(np.mean(aucs))
    elif task == "regression":
        pred = np.asarray(aux["pred"]).reshape(-1)[:n_val]
        true = val_ds.arrays["redshift"][:n_val]
        out["R2_val"] = float(r2_score(jnp.asarray(true), jnp.asarray(pred)))
    elif task == "classification":
        logits = np.asarray(aux["logits"])
        logits = logits.reshape(-1, logits.shape[-1])[:n_val]
        pred = logits.argmax(axis=-1)
        true = val_ds.arrays["label"][:n_val]
        out["f1_val"] = float(
            macro_f1(jnp.asarray(true), jnp.asarray(pred), n_classes)
        )
    # masked: val_loss only
    return out
