"""Parallel training of independent runs on one chip (or mesh) via vmap.

TPU-first capability with NO reference counterpart: the reference trains
k-fold members and sweep points strictly sequentially — one ``wandb.agent``
run at a time (script_wandb.py:339), five folds meaning five full trainings
(configs/config_grid.yaml ``foldnumber: values: [0..4]``). Stacking N
independent training states and vmapping the SAME jitted epoch scan over
the member axis multiplies the batch dimension of every matmul, and N runs
share one compile and one host loop. Measured on the v5e
(benchmarks/ensemble_results.json): at the reference's real-data batch 32
five folds cost 3.6x one fold's step time (1.37x wall speedup) + one
~4-min cold compile instead of five; at the saturated headline batch 256
the member axis costs ~linear in step time and the gain is the
compile/launch amortization. With a device mesh the member axis is sharded
instead — embarrassingly parallel (zero collectives), members spread over
chips.

Semantics: member i trains exactly like a ``Trainer.fit`` run with
``cfg.seed = member.seed`` — same init key, same host-RNG shuffles, same
per-epoch key splits, same early-stopping bookkeeping on its own metrics,
same run-directory contract (config.yaml + split manifests + metrics.jsonl
+ ckpt_best/ckpt_last). Numerically the stacked program batches every
reduction, so trained parameters agree with the sequential run to float-
reassociation accumulation (losses/metrics to ~1e-5), not bitwise — pinned
by tests/test_ensemble.py against sequential Trainer runs.

Constraints (documented, not silent): members share one model architecture
and one optimizer STRUCTURE. Per-member learning rates are supported (the
lr rides in the optimizer state, see ``_scale_by_member_lr``) and compose
with a group-uniform ``StepLR`` schedule and/or freeze mask (the staircase
decay factor and the path-structural mask are member-independent, so they
stack; only per-member step_size/gamma/freeze SHAPES are unsupported).
Members whose train sets need
fewer steps than the ensemble-wide ``max`` are wrap-padded with extra
steps from their own permutation — identical to sequential training when
fold sizes tie (the stratified k-fold case up to remainder ±1).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from ..data.batching import ArrayDataset, Batch, epoch_indices
from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import replicated
from .checkpoint import CheckpointManager, save_run_sidecars
from .state import TrainState
from .step import make_epoch_runner, make_eval_runner
from .trainer import (
    TrainerConfig,
    compute_task_metrics,
    _fit_end_barrier,
    _to_host,
)
from ..utils.logging import MetricsLogger


@dataclasses.dataclass
class Member:
    """One independent run inside the stacked program.

    ``train_indices``/``val_indices`` index the SHARED dataset (the whole
    point: every member gathers its batches from one HBM-resident copy).
    ``lr=None`` inherits the ensemble TrainerConfig's lr.
    """

    name: str
    seed: int
    train_indices: np.ndarray
    val_indices: np.ndarray
    lr: Optional[float] = None
    config_dump: Optional[Dict[str, Any]] = None


# -- stacking ----------------------------------------------------------------


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Stack per-member TrainStates along a new leading member axis.
    Static fields (apply_fn, tx) must be identical across members."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_member(stacked, i: int):
    """Member i's TrainState (for checkpointing / export / eval)."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def n_members(stacked) -> int:
    return int(jax.tree_util.tree_leaves(stacked)[0].shape[0])


def select_members(mask, new, old):
    """Per-member select: where ``mask[i]``, take ``new``'s member i, else
    ``old``'s (used to snapshot best-so-far states on device)."""

    def sel(n, o):
        m = mask.reshape(mask.shape[:1] + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


_select_members = jax.jit(select_members)


# -- per-member learning rate -------------------------------------------------


def _scale_by_member_lr(init_lr: float) -> optax.GradientTransformation:
    """Final lr scaling as optimizer STATE so each stacked member carries its
    own value (chained after ``optax.radam(learning_rate=1.0)``; RAdam's
    update is exactly linear in lr, so this matches
    ``optax.radam(learning_rate=lr)`` bit-for-bit)."""

    def init_fn(params):
        del params
        return {"member_lr": jnp.asarray(init_lr, jnp.float32)}

    def update_fn(updates, state, params=None):
        del params
        lr = state["member_lr"]
        return jax.tree_util.tree_map(lambda u: u * lr, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_member_lr_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    step_size: Optional[int] = None,
    gamma: Optional[float] = None,
    steps_per_epoch: int = 1,
    freeze: Optional[Callable] = None,
    params: Any = None,
) -> optax.GradientTransformation:
    """The ensemble counterpart of optim.build_optimizer (torch-style L2
    decay + RAdam + optional StepLR + optional freezing), with the lr
    stored in the optimizer state so ``set_member_lrs`` can give every
    member its own.

    A group-uniform StepLR composes exactly with per-member lrs: the
    staircase decay factor is member-independent and RAdam's update is
    linear in lr, so ``radam(1.0) -> scale_by_schedule(decay) ->
    scale(member_lr)`` reproduces ``optax.radam(StepLR(member_lr))`` to
    float-multiplication reassociation (one reordered scalar multiply).
    Freezing is a path-structural mask shared by all members — exactly
    optim.build_optimizer's ``multi_transform`` branch."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.radam(learning_rate=1.0))
    if step_size is not None and gamma is not None:
        chain.append(
            optax.scale_by_schedule(
                optax.exponential_decay(
                    init_value=1.0,
                    transition_steps=step_size * steps_per_epoch,
                    decay_rate=gamma,
                    staircase=True,
                )
            )
        )
    chain.append(_scale_by_member_lr(lr))
    tx = optax.chain(*chain)
    if freeze is not None:
        from .optim import freeze_mask

        if params is None:
            raise ValueError("freezing requires the params pytree")
        # per-leaf state like optim.build_optimizer's frozen branch (flatten
        # cannot see through MaskedNode placeholders)
        return optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            freeze_mask(params, freeze),
        )
    return optax.flatten(tx)


def set_member_lrs(stacked_state: TrainState, lrs: Sequence[float]) -> TrainState:
    """Write per-member learning rates into the stacked optimizer state."""
    lrs = jnp.asarray(np.asarray(lrs, dtype=np.float32))
    found = []

    def repl(path, leaf):
        if any(
            isinstance(p, jax.tree_util.DictKey) and p.key == "member_lr"
            for p in path
        ):
            if leaf.shape != lrs.shape:
                raise ValueError(
                    f"member_lr leaf has shape {leaf.shape}; expected "
                    f"{lrs.shape} — is the state stacked?"
                )
            found.append(True)
            return lrs.astype(leaf.dtype)
        return leaf

    new_opt = jax.tree_util.tree_map_with_path(repl, stacked_state.opt_state)
    if not found:
        raise ValueError(
            "no member_lr leaf in opt_state — build the optimizer with "
            "build_member_lr_optimizer"
        )
    return stacked_state.replace(opt_state=new_opt)


# -- stacked runners ----------------------------------------------------------


def make_ensemble_epoch_runner(model, **kwargs) -> Callable:
    """``run(states, data, plans, keys) -> (states, losses)`` with leading
    member axes on states/plans/keys/losses and a SHARED dataset Batch."""
    run = make_epoch_runner(model, jit=False, **kwargs)
    return jax.jit(jax.vmap(run, in_axes=(0, None, 0, 0)), donate_argnums=(0,))


def make_ensemble_eval_runner(model, **kwargs) -> Callable:
    run = make_eval_runner(model, jit=False, **kwargs)
    return jax.jit(jax.vmap(run, in_axes=(0, None, 0, 0)))


# -- plans ---------------------------------------------------------------------


def member_train_plan(
    member: Member, batch_size: int, rng: np.random.Generator, steps: int
) -> np.ndarray:
    """One epoch's (steps, batch_size) GLOBAL index plan for a member:
    exactly ``Trainer.fit``'s shuffled wrap-padded plan mapped through the
    member's train indices, wrap-extended to the ensemble-wide step count."""
    n = len(member.train_indices)
    local = epoch_indices(n, batch_size, rng=rng, shuffle=True, pad="wrap")
    if local.shape[0] < steps:
        flat = local.reshape(-1)
        perm = flat[:n]  # the epoch's permutation
        extra = steps * batch_size - flat.size
        reps = np.concatenate([perm] * (-(-extra // n)))[:extra]
        flat = np.concatenate([flat, reps])
        local = flat.reshape(steps, batch_size)
    return np.asarray(member.train_indices, dtype=np.int32)[local]


def member_val_plan(member: Member, batch_size: int, steps: int) -> np.ndarray:
    """Sequential repeat_last-padded eval plan mapped to global indices and
    padded with whole repeat batches up to the ensemble-wide step count
    (the padding rows are trimmed on host by each member's n_val)."""
    local = epoch_indices(
        len(member.val_indices), batch_size, shuffle=False, pad="repeat_last"
    )
    if local.shape[0] < steps:
        pad = np.broadcast_to(
            local[-1:], (steps - local.shape[0], batch_size)
        )
        local = np.concatenate([local, pad])
    return np.asarray(member.val_indices, dtype=np.int32)[local]


# -- the driver ----------------------------------------------------------------


# One schema for all checkpoints: the per-run manager's state dict (drift
# between the two would silently diverge the formats).
_stacked_state_dict = CheckpointManager._state_dict


def _stacked_state_from_dict(template: TrainState, d: Dict[str, Any]) -> TrainState:
    return template.replace(
        params=d["params"], opt_state=d["opt_state"], step=d["step"],
        batch_stats=d.get("batch_stats", template.batch_stats),
    )


class _EnsembleCheckpoint:
    """Preemption-safe resume for the STACKED program: one orbax save per
    epoch under ``<run_dir>/_ensemble/`` holding the current / best-snapshot /
    stop-snapshot stacked states, plus a ``bookkeeping.json`` sidecar with the
    host-side early-stopping state. One save covers all N members (the
    per-member ckpt_best/ckpt_last contract is still written at the end).
    ``max_to_keep=2`` so a crash between the state save and the sidecar write
    leaves the previous epoch restorable."""

    def __init__(self, ckpt_dir: str):
        self.dir = os.path.abspath(ckpt_dir)
        self._mgr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=2)
        )

    def save(self, epoch: int, states, best_states, last_states,
             book: Dict[str, Any]) -> None:
        payload = {
            "cur": _stacked_state_dict(states),
            "best": _stacked_state_dict(
                states if best_states is None else best_states
            ),
            "last": _stacked_state_dict(
                states if last_states is None else last_states
            ),
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if jax.process_index() != 0:
            # every process joins the orbax save; only rank 0 writes the
            # sidecar (concurrent writers could tear the JSON on shared FS)
            return
        book = dict(book, epoch=epoch,
                    have_best=best_states is not None,
                    have_last=last_states is not None)
        tmp = os.path.join(self.dir, "bookkeeping.json.tmp")
        with open(tmp, "w") as f:
            json.dump(book, f)
        os.replace(tmp, os.path.join(self.dir, "bookkeeping.json"))

    def try_restore(self, template: TrainState):
        """Returns (states, best_states, last_states, book) or None when no
        complete checkpoint exists."""
        path = os.path.join(self.dir, "bookkeeping.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            book = json.load(f)
        epoch = int(book["epoch"])
        if epoch not in self._mgr.all_steps():
            raise RuntimeError(
                f"ensemble bookkeeping points at epoch {epoch} but saved "
                f"steps are {sorted(self._mgr.all_steps())} — the run dir "
                "is inconsistent; delete _ensemble/ to restart fresh"
            )
        sd = _stacked_state_dict(template)
        restored = self._mgr.restore(
            epoch,
            args=ocp.args.StandardRestore(
                {"cur": sd, "best": sd, "last": sd}
            ),
        )
        states = _stacked_state_from_dict(template, restored["cur"])
        best_states = (
            _stacked_state_from_dict(template, restored["best"])
            if book["have_best"] else None
        )
        last_states = (
            _stacked_state_from_dict(template, restored["last"])
            if book["have_last"] else None
        )
        return states, best_states, last_states, book

    def close(self):
        self._mgr.close()


def _member_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(DATA_AXIS))


def _put(tree, mesh):
    """Member-axis placement: shard leading (member) dims over the mesh's
    data axis (multi-process aware)."""
    if mesh is None:
        return jax.tree_util.tree_map(jnp.asarray, tree)
    from ..parallel.distributed import global_put

    sharding = _member_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: global_put(np.asarray(x), sharding), tree
    )


def fit_members(
    model,
    task: str,
    cfg: TrainerConfig,
    dataset: ArrayDataset,
    members: Sequence[Member],
    run_dir: Optional[str] = None,
    mesh=None,
    n_classes: int = 5,
    monitor: Optional[str] = None,
    mode: Optional[str] = None,
    freeze=None,
    params_override: Optional[Callable] = None,
    resume: bool = False,
    ensemble_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Train all ``members`` simultaneously as ONE vmapped jitted program.

    Per member this reproduces ``Trainer.fit(train_ds, val_ds)`` with
    ``train_ds = dataset.subset(m.train_indices)`` and the member's seed:
    numerically equivalent parameter trajectories (float-reassociation
    accuracy — tests/test_ensemble.py), identical early-stopping
    bookkeeping, and the same on-disk run contract under
    ``<run_dir>/<member.name>/``. Checkpoints are written once at the end
    (best-state snapshots are kept on device during training), so per-epoch
    host work stays a few scalars per member.

    With ``mesh``, states/plans/keys are sharded member-axis over the data
    axis (len(members) must be a multiple of the axis size); the dataset is
    replicated. No collectives are introduced — members are independent.

    With ``run_dir``, one ensemble-level checkpoint of the stacked state is
    written per epoch (``<run_dir>/_ensemble/``); ``resume=True`` restores
    it and continues — the same preemption-safety ``Trainer.fit`` has,
    compatible with ``scripts/supervise.py``.
    """
    if not members:
        raise ValueError("no members")
    names = [m.name for m in members]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate member names: {names}")
    for m in members:
        if len(m.train_indices) == 0 or len(m.val_indices) == 0:
            raise ValueError(
                f"member {m.name} has an empty "
                f"{'train' if len(m.train_indices) == 0 else 'val'} index "
                "set — every member needs at least one sample per split"
            )
    n = len(members)
    if mesh is not None and n % mesh.shape[DATA_AXIS]:
        raise ValueError(
            f"{n} members cannot shard over the mesh's '{DATA_AXIS}' axis "
            f"of size {mesh.shape[DATA_AXIS]}: the member count must be a "
            "multiple of the axis size (members are placed whole, one or "
            "more per device)"
        )
    is_main = jax.process_index() == 0

    if monitor is None or mode is None:
        d_monitor, d_mode = (
            ("f1_val", "max") if task == "classification" else ("val_loss", "min")
        )
        # Trainer precedence: explicit kwarg > TrainerConfig > task default
        monitor = monitor or cfg.monitor or d_monitor
        mode = mode or cfg.mode or d_mode

    # ensemble-wide static step counts
    own_steps = [
        -(-len(m.train_indices) // cfg.batch_size) for m in members
    ]
    steps = max(own_steps)
    short = [m.name for m, s in zip(members, own_steps) if s != steps]
    if short and is_main:
        # surfaced, not just documented: wrap-extended members take extra
        # optimizer updates per epoch and their trajectories deviate from a
        # sequential Trainer.fit whenever fold sizes cross a batch boundary
        import warnings

        warnings.warn(
            f"members {short} need fewer steps than the ensemble-wide "
            f"{steps} per epoch and are wrap-extended with extra batches "
            "from their own permutation — their trajectories will not match "
            "a sequential run exactly (equal-sized folds avoid this)"
        )
    val_steps_i = [
        -(-len(m.val_indices) // cfg.batch_size) for m in members
    ]
    val_steps = max(val_steps_i)
    n_val_i = [len(m.val_indices) for m in members]
    # host-side val views for metrics, built once (not per eval epoch)
    val_subsets = [dataset.subset(m.val_indices) for m in members]

    # per-member host RNG/key discipline — exactly Trainer.fit's
    rngs = [np.random.default_rng(m.seed) for m in members]
    root_keys = [jax.random.PRNGKey(m.seed + 1) for m in members]

    # sidecars + loggers
    loggers: List[Optional[MetricsLogger]] = []
    member_dirs: List[Optional[str]] = []
    for m in members:
        if run_dir:
            mdir = os.path.join(run_dir, m.name)
            member_dirs.append(mdir)
            if is_main:
                fns = dataset.filenames
                save_run_sidecars(
                    mdir,
                    m.config_dump or dataclasses.asdict(cfg),
                    None if fns is None else [fns[i] for i in m.train_indices],
                    None if fns is None else [fns[i] for i in m.val_indices],
                )
                loggers.append(MetricsLogger(mdir, use_wandb=False))
            else:
                loggers.append(None)
        else:
            member_dirs.append(None)
            loggers.append(None)

    # shared data, stacked state
    data = dataset.to_device(replicated(mesh) if mesh is not None else None)
    example = data.take(jnp.arange(cfg.batch_size) % len(dataset))
    lrs = [m.lr for m in members]
    varied_lr = any(lr is not None and lr != cfg.lr for lr in lrs)

    def init_params(seed: int):
        variables = model.init(jax.random.PRNGKey(seed), example)
        params = variables["params"]
        if params_override is not None:
            params = params_override(params)
        return params, variables.get("batch_stats")

    member_inits = [init_params(m.seed) for m in members]
    if varied_lr:
        tx = build_member_lr_optimizer(
            cfg.lr,
            cfg.weight_decay,
            step_size=cfg.step_size,
            gamma=cfg.gamma,
            steps_per_epoch=steps,
            freeze=freeze,
            params=member_inits[0][0],
        )
    else:
        from .optim import build_optimizer

        tx = build_optimizer(
            lr=cfg.lr,
            weight_decay=cfg.weight_decay,
            step_size=cfg.step_size,
            gamma=cfg.gamma,
            steps_per_epoch=steps,
            freeze=freeze,
            params=member_inits[0][0],
        )

    states = stack_states(
        [
            TrainState.create(
                apply_fn=model.apply, params=p, tx=tx, batch_stats=bs
            )
            for p, bs in member_inits
        ]
    )
    if varied_lr:
        states = set_member_lrs(
            states, [cfg.lr if lr is None else lr for lr in lrs]
        )
    states = _put(states, mesh)
    # Best-so-far and at-stop snapshots, kept on device. NEVER aliases of
    # ``states``: the epoch runner donates its input state buffers, so
    # snapshots must be fresh jit outputs (_select_members below always
    # produces new buffers). ``last_states`` freezes a member's state at its
    # early-stop epoch — the static stacked program keeps training inactive
    # members, and those extra epochs must not leak into its results.
    best_states = None
    last_states = None

    run_epoch = make_ensemble_epoch_runner(
        model,
        noise_level_img=cfg.noise_level_img,
        noise_level_mag=cfg.noise_level_mag,
        rotate_images=cfg.rotate_images,
    )
    run_eval = make_ensemble_eval_runner(model, rotate_images=cfg.rotate_images)

    val_plans = _put(
        np.stack(
            [member_val_plan(m, cfg.batch_size, val_steps) for m in members]
        ),
        mesh,
    )

    history = [
        {"train_loss": [], "val_loss": []} for _ in members
    ]
    metric_rows: List[List[Dict[str, float]]] = [[] for _ in members]
    best = [{"value": None, "epoch": -1} for _ in members]
    since_best = np.zeros(n, dtype=int)
    active = np.ones(n, dtype=bool)
    epochs_run = np.zeros(n, dtype=int)
    t_start = time.time()

    if ensemble_dir is None and run_dir:
        ensemble_dir = os.path.join(run_dir, "_ensemble")
    ens_ckpt = _EnsembleCheckpoint(ensemble_dir) if ensemble_dir else None
    start_epoch = 0
    if resume and ens_ckpt is not None:
        restored = ens_ckpt.try_restore(states)
        if restored is not None:
            states, best_states, last_states, book = restored
            if book.get("names") != names:
                raise RuntimeError(
                    f"resume member mismatch: checkpoint has "
                    f"{book.get('names')}, run has {names}"
                )
            history = book["history"]
            metric_rows = book["metric_rows"]
            best = book["best"]
            since_best = np.asarray(book["since_best"], dtype=int)
            active = np.asarray(book["active"], dtype=bool)
            epochs_run = np.asarray(book["epochs_run"], dtype=int)
            start_epoch = int(book["epoch"]) + 1
            # advance the host RNG/key streams past the completed epochs so
            # the resumed epochs see exactly the shuffles/augmentation keys
            # an uninterrupted run would
            for _ in range(start_epoch):
                for i, m in enumerate(members):
                    member_train_plan(m, cfg.batch_size, rngs[i], steps)
                    root_keys[i], _, _ = jax.random.split(root_keys[i], 3)

    epoch_range = (
        range(start_epoch, cfg.epochs) if active.any() else range(0)
    )
    epoch = start_epoch - 1
    for epoch in epoch_range:
        plans = _put(
            np.stack(
                [
                    member_train_plan(m, cfg.batch_size, rngs[i], steps)
                    for i, m in enumerate(members)
                ]
            ),
            mesh,
        )
        ekeys, vkeys = [], []
        for i in range(n):
            root_keys[i], ekey, vkey = jax.random.split(root_keys[i], 3)
            ekeys.append(ekey)
            vkeys.append(vkey)
        ekeys = _put(jnp.stack(ekeys), mesh)
        vkeys = _put(jnp.stack(vkeys), mesh)

        t0 = time.time()
        states, losses = run_epoch(states, data, plans, ekeys)
        # _to_host gathers member-sharded outputs over DCN in multi-process
        # runs (plain device_get rejects non-addressable arrays)
        losses = _to_host(losses)  # (n, steps)
        step_time = (time.time() - t0) / steps

        do_eval = epoch % cfg.eval_every_epochs == 0
        if do_eval:
            val_losses, aux = run_eval(states, data, val_plans, vkeys)
            val_losses = _to_host(val_losses)
            aux = jax.tree_util.tree_map(_to_host, aux)

        improved = np.zeros(n, dtype=bool)
        stopped = np.zeros(n, dtype=bool)
        for i, m in enumerate(members):
            if not active[i]:
                continue
            train_loss = float(losses[i].mean())
            if not np.isfinite(train_loss):
                raise FloatingPointError(
                    f"non-finite training loss for member {m.name} at epoch "
                    f"{epoch}"
                )
            history[i]["train_loss"].append(train_loss)
            metrics: Dict[str, float] = {
                "epoch": epoch,
                "train_loss": train_loss,
                "step_time_s": step_time,
                # all members advance together: the whole ensemble's samples
                # per wall-second, plus this member's own share
                "samples_per_s": n * cfg.batch_size / max(step_time, 1e-9),
                "member_samples_per_s": cfg.batch_size / max(step_time, 1e-9),
            }
            if do_eval:
                metrics["val_loss"] = float(
                    val_losses[i, : val_steps_i[i]].mean()
                )
                history[i]["val_loss"].append(metrics["val_loss"])
                aux_i = jax.tree_util.tree_map(lambda x, i=i: x[i], aux)
                metrics.update(
                    compute_task_metrics(
                        task,
                        aux_i,
                        val_subsets[i],
                        n_val_i[i],
                        n_classes,
                    )
                )
            metric_rows[i].append(metrics)
            if loggers[i]:
                loggers[i].log(metrics, step=epoch)
            epochs_run[i] = epoch + 1

            if monitor in metrics:
                current = metrics[monitor]
                better = (
                    best[i]["value"] is None
                    or (mode == "min" and current < best[i]["value"])
                    or (mode == "max" and current > best[i]["value"])
                )
                if better:
                    best[i] = {"value": current, "epoch": epoch}
                    since_best[i] = 0
                    improved[i] = True
                else:
                    since_best[i] += 1
                if since_best[i] >= cfg.patience:
                    active[i] = False
                    stopped[i] = True

        if improved.any():
            src = states if best_states is None else best_states
            best_states = _select_members(
                _put(jnp.asarray(improved), mesh), states, src
            )
        if stopped.any():
            # freeze each newly-stopped member's state at its stop epoch
            src = states if last_states is None else last_states
            last_states = _select_members(
                _put(jnp.asarray(stopped), mesh), states, src
            )
        if ens_ckpt is not None:
            ens_ckpt.save(
                epoch, states, best_states, last_states,
                {
                    "names": names,
                    "history": history,
                    "metric_rows": metric_rows,
                    "best": best,
                    "since_best": since_best.tolist(),
                    "active": active.tolist(),
                    "epochs_run": epochs_run.tolist(),
                },
            )
        if not active.any():
            break

    # Final per-member states: live state for members that ran to the end,
    # the at-stop snapshot for early-stopped ones (sequential semantics —
    # training past the stop epoch must not leak into the results).
    if last_states is not None:
        final_states = _select_members(
            _put(jnp.asarray(active), mesh), states, last_states
        )
    else:
        final_states = states

    # end-of-run checkpoints: best snapshot + final state per member
    results: Dict[str, Any] = {"members": {}, "wall_time_s": time.time() - t_start}
    for i, m in enumerate(members):
        res: Dict[str, Any] = {
            "history": history[i],
            "metric_rows": metric_rows[i],
            "best": best[i],
            "epochs_run": int(epochs_run[i]),
            # all members share the ensemble's wall clock (the point)
            "wall_time_s": results["wall_time_s"],
        }
        if member_dirs[i]:
            ckpts = CheckpointManager(member_dirs[i], monitor, mode, cfg.keep_best)
            if best[i]["value"] is not None:
                row = next(
                    r
                    for r in metric_rows[i]
                    if r["epoch"] == best[i]["epoch"]
                )
                ckpts.save(
                    best[i]["epoch"], unstack_member(best_states, i), row
                )
            last_epoch = int(epochs_run[i]) - 1
            if last_epoch >= 0 and (
                last_epoch != best[i]["epoch"] or best[i]["value"] is None
            ):
                ckpts.save(last_epoch, unstack_member(final_states, i), {})
            ckpts.wait()
            res["best_ckpt_epoch"] = ckpts.best_epoch()
            ckpts.close()
            if loggers[i]:
                summary = {
                    f"best_{monitor}": best[i]["value"],
                    "best_epoch": best[i]["epoch"],
                    "best_ckpt_epoch": res.get("best_ckpt_epoch"),
                }
                if history[i]["val_loss"]:
                    summary["best_val_loss"] = float(
                        np.min(history[i]["val_loss"])
                    )
                aucs = [
                    r["AUC_val"] for r in metric_rows[i] if "AUC_val" in r
                ]
                if aucs:
                    summary["best_auc"] = float(np.max(aucs))
                loggers[i].set_summary(**summary)
                loggers[i].close()
        res["state"] = unstack_member(final_states, i)
        results["members"][m.name] = res
    results["states"] = final_states
    results["best_states"] = best_states
    if ens_ckpt is not None:
        ens_ckpt.close()
    _fit_end_barrier()
    return results
