"""Preflight (``--check``) validation for the training CLIs.

Validates a sweep end-to-end WITHOUT data, devices, or compilation: every
grid point's model is built and one full train step is shape-checked with
``jax.eval_shape`` (abstract arrays only — no FLOPs, no TPU claim, runs in
seconds on the submit host). The reference has no counterpart — its config
errors surface minutes into a W&B agent run (script_wandb.py:32-271); on a
pod queue that round trip is expensive, so fail-fast validation is a
product feature here.

Per grid point the report carries: parameter count/bytes, optimizer-state
bytes (the RAdam state the step allocates), a train-memory estimate
(params + grads + optimizer state), which attention path each sequence
tower will dispatch to on TPU (flash kernel vs fused XLA dense —
ops/attention.py rules), and how many target leaves a configured
pretrained checkpoint actually populates (a 0/N match means the wrong
checkpoint, the reference's silent ``strict=False`` failure mode,
models_multimodal.py:817). Errors name the grid point and the offending
key, and mesh requests are checked for batch divisibility before any chip
sees the program.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ..data.batching import Batch


def abstract_batch(
    combinations,
    batch_size: int,
    lc_len: int,
    sp_len: int,
    image_size: int = 60,
    channels: int = 3,
) -> Batch:
    """A Batch of ``jax.ShapeDtypeStruct`` leaves with the shapes ingest
    would produce (``lc_len`` is the band-blocked TOTAL light-curve length,
    nband * max_lightcurve_data_len)."""
    import jax
    import jax.numpy as jnp

    def sds(*shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    fields: Dict[str, Any] = {
        "redshift": sds(batch_size),
        "label": sds(batch_size, dtype=jnp.int32),
    }
    if "lightcurve" in combinations:
        fields.update(
            x_lc=sds(batch_size, lc_len),
            t_lc=sds(batch_size, lc_len),
            mask_lc=sds(batch_size, lc_len, dtype=jnp.bool_),
            err_lc=sds(batch_size, lc_len),
        )
    if "spectral" in combinations:
        fields.update(
            x_sp=sds(batch_size, sp_len),
            t_sp=sds(batch_size, sp_len),
            mask_sp=sds(batch_size, sp_len, dtype=jnp.bool_),
            err_sp=sds(batch_size, sp_len),
        )
    if "host_galaxy" in combinations:
        fields["x_img"] = sds(batch_size, image_size, image_size, channels)
    return Batch(**fields)


def _count_bytes(tree) -> Tuple[int, int]:
    """(n_elements, n_bytes) over a tree of ShapeDtypeStructs/arrays."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    n = sum(int(np.prod(l.shape)) for l in leaves if hasattr(l, "shape"))
    b = sum(
        int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
        for l in leaves
        if hasattr(l, "shape")
    )
    return n, b


def _dispatch_note(tower: str, t: int, emb: int, heads: int, batch: int,
                   use_pallas) -> str:
    """Which attention path this tower takes on TPU (ops/attention.py:
    auto = flash kernel when T >= 128 and the kernel supports the shape)."""
    from ..ops.pallas_attention import supports

    head_dim = emb // heads
    ok = supports(t, head_dim, batch * heads)
    if use_pallas is False:
        path = "xla-dense (use_pallas=False)"
    elif use_pallas is True:
        path = "flash" if ok else "xla-dense (kernel shape constraints)"
    else:
        path = "flash" if (t >= 128 and ok) else "xla-dense"
    return f"{tower}: T={t} emb={emb} heads={heads} -> {path}"


def preflight_run(
    run_cfg: Dict[str, Any],
    extra: Dict[str, Any],
    nband: int,
    lc_len: int,
    sp_len: int,
    image_size: int = 60,
    model_builder: Optional[Callable] = None,
    epochs_override: Optional[int] = None,
    n_train: Optional[int] = None,
    combinations: Optional[Tuple[str, ...]] = None,
) -> Dict[str, Any]:
    """Shape-check ONE grid point: build the model, then eval_shape
    init -> optimizer init -> one train step. Raises on any config/shape
    error; returns the report dict otherwise. ``combinations`` overrides
    ``extra_args.combinations`` for the abstract batch (the masked trainer
    consumes light curves only, whatever the YAML sweeps)."""
    import jax

    from .experiment import _build_run
    from .optim import build_optimizer
    from .state import TrainState
    from .step import make_train_step

    model, task, freeze, params_override, tcfg = _build_run(
        run_cfg, extra, nband, model_builder, epochs_override
    )
    if combinations is None:
        combinations = tuple(extra["combinations"])
    batch = abstract_batch(
        combinations, tcfg.batch_size, lc_len, sp_len, image_size
    )
    steps_per_epoch = (
        max(1, -(-n_train // tcfg.batch_size)) if n_train else 1
    )

    def init_and_step(key, batch):
        variables = model.init(key, batch)
        params = variables["params"]
        tx = build_optimizer(
            lr=tcfg.lr,
            weight_decay=tcfg.weight_decay,
            step_size=tcfg.step_size,
            gamma=tcfg.gamma,
            steps_per_epoch=steps_per_epoch,
            freeze=freeze,
            params=params,
        )
        state = TrainState.create(
            apply_fn=model.apply,
            params=params,
            tx=tx,
            batch_stats=variables.get("batch_stats"),
        )
        step = make_train_step(
            model,
            None,
            tcfg.noise_level_img,
            tcfg.noise_level_mag,
        )
        new_state, loss = step(state, batch, key)
        return params, state.opt_state, loss

    params_s, opt_s, loss_s = jax.eval_shape(
        init_and_step, jax.random.PRNGKey(0), batch
    )

    n_params, param_bytes = _count_bytes(params_s)
    _, opt_bytes = _count_bytes(opt_s)

    report: Dict[str, Any] = {
        "task": task,
        "batch_size": tcfg.batch_size,
        "epochs": tcfg.epochs,
        "lr": tcfg.lr,
        "n_params": n_params,
        "param_bytes": param_bytes,
        "opt_state_bytes": opt_bytes,
        # params + grads + optimizer state; activations are shape- and
        # schedule-dependent, so this is the static floor, not a ceiling
        "train_state_bytes": 2 * param_bytes + opt_bytes,
        "loss_dtype": str(loss_s.dtype),
        "notes": [],
    }

    # Attention dispatch per sequence tower (TPU target; run_cfg carries
    # the tower dims for both the CLIP and masked builders — config.py
    # build_clip_config / factory.masked_model_builder read the same keys).
    use_pallas = extra.get("use_pallas")
    if "lightcurve" in combinations and "emb" in run_cfg:
        report["notes"].append(
            _dispatch_note(
                "lightcurve", lc_len, int(run_cfg["emb"]),
                int(run_cfg.get("heads", 2)), tcfg.batch_size, use_pallas,
            )
        )
    if "spectral" in combinations and "emb" in run_cfg:
        emb_sp = int(run_cfg.get("emb_spectral", run_cfg["emb"]))
        heads_sp = int(run_cfg.get("heads_spectral", run_cfg.get("heads", 2)))
        report["notes"].append(
            _dispatch_note(
                "spectral", sp_len, emb_sp, heads_sp, tcfg.batch_size,
                use_pallas,
            )
        )

    # Pretrained-checkpoint surgery: apply the override to the ABSTRACT
    # param tree. merge_params_nonstrict copies only shape-matching leaves
    # (models_multimodal.py:817 semantics), so the number of leaves that
    # became concrete counts how much of the checkpoint actually lands —
    # 0 matched means the wrong checkpoint, which the reference's
    # strict=False load would silently train through.
    if params_override is not None:
        merged = params_override(params_s)
        leaves = jax.tree_util.tree_leaves(merged)
        concrete = sum(
            0 if isinstance(l, jax.ShapeDtypeStruct) else 1 for l in leaves
        )
        report["pretrain_leaves_matched"] = (concrete, len(leaves))
        if concrete == 0:
            raise ValueError(
                "pretrained checkpoint matches 0 parameter leaves "
                "(wrong architecture or wrong path?)"
            )
    return report


def preflight_sweep(
    sweep,
    nband: int,
    lc_len: int,
    sp_len: int,
    image_size: int = 60,
    model_builder: Optional[Callable] = None,
    epochs_override: Optional[int] = None,
    max_runs: Optional[int] = None,
    n_train: Optional[int] = None,
    mesh_shape: Optional[Dict[str, int]] = None,
    combinations: Optional[Tuple[str, ...]] = None,
) -> Tuple[List[Dict[str, Any]], List[str]]:
    """Validate every grid point of a sweep. Returns (reports, errors);
    an empty error list means the sweep is safe to submit. ``mesh_shape``
    is the requested {'data': N, 'model': M} layout — checked for batch
    divisibility without constructing a device mesh."""
    from ..config.config import SweepScheduler

    extra = sweep.extra_args
    scheduler = SweepScheduler(sweep, max_runs=max_runs)
    reports: List[Dict[str, Any]] = []
    errors: List[str] = []

    for key in ("pretrain_lc_path", "pretrain_path"):
        p = extra.get(key)
        if p and not os.path.exists(p):
            errors.append(f"extra_args.{key}: {p} does not exist")

    k = -1
    while True:
        run_cfg = scheduler.suggest()
        if run_cfg is None:
            break
        k += 1
        name = f"run-{k}"
        try:
            rep = preflight_run(
                run_cfg, extra, nband, lc_len, sp_len, image_size,
                model_builder=model_builder,
                epochs_override=epochs_override,
                n_train=n_train,
                combinations=combinations,
            )
        except Exception as e:  # noqa: BLE001 — report, don't crash the scan
            errors.append(f"{name} {dict(run_cfg)}: {type(e).__name__}: {e}")
            continue
        rep["name"] = name
        rep["run_cfg"] = dict(run_cfg)
        if mesh_shape:
            n_data = int(mesh_shape.get("data", 1))
            n_model = int(mesh_shape.get("model", 1))
            if rep["batch_size"] % max(n_data, 1) != 0:
                errors.append(
                    f"{name}: batch_size {rep['batch_size']} not divisible "
                    f"by the data mesh axis ({n_data})"
                )
            if n_model > 1 and "emb" in run_cfg:
                for tower, emb in (
                    ("lightcurve", int(run_cfg["emb"])),
                    ("spectral", int(run_cfg.get("emb_spectral",
                                                 run_cfg["emb"]))),
                ):
                    if (4 * emb) % n_model != 0:
                        rep["notes"].append(
                            f"tp={n_model}: {tower} FF hidden {4 * emb} not "
                            f"divisible — those kernels replicate "
                            f"(parallel/sharding.py falls back silently)"
                        )
        reports.append(rep)
        scheduler.observe(run_cfg, None)
    return reports, errors


def add_check_args(ap) -> None:
    """Attach the shared --check CLI flags to an argparse parser."""
    ap.add_argument("--check", action="store_true",
                    help="validate the sweep without training: build every "
                         "grid point's model and shape-check one full train "
                         "step (jax.eval_shape — no data, no device, no "
                         "compile). Exits non-zero on any error")
    ap.add_argument("--check-devices", type=int, default=None,
                    help="with --check and --mesh/--tp: the target pod's "
                         "total device count, so mesh divisibility is "
                         "validated too")


def run_cli_check(
    sweep,
    nband: int,
    lc_len: int,
    sp_len: int,
    args,
    model_builder: Optional[Callable] = None,
    combinations: Optional[Tuple[str, ...]] = None,
    image_size: int = 60,
) -> int:
    """The CLIs' --check entry: preflight the sweep and return the exit
    code (0 = every grid point validated)."""
    mesh_shape = None
    tp = int(getattr(args, "tp", 1) or 1)
    want_mesh = bool(getattr(args, "mesh", False)) or tp > 1
    n_devices = getattr(args, "check_devices", None)
    if want_mesh and n_devices:
        mesh_shape = {"data": max(1, n_devices // max(tp, 1)), "model": tp}
    elif want_mesh:
        print(
            "--check: pass --check-devices N (the pod's device count) to "
            "also validate mesh divisibility for --mesh/--tp"
        )
    reports, errors = preflight_sweep(
        sweep,
        nband=nband,
        lc_len=lc_len,
        sp_len=sp_len,
        image_size=image_size,
        model_builder=model_builder,
        epochs_override=getattr(args, "epochs", None),
        max_runs=getattr(args, "max_runs", None)
        or sweep.extra_args.get("nruns"),
        mesh_shape=mesh_shape,
        combinations=combinations,
    )
    print(format_report(reports, errors))
    return 1 if errors else 0


def format_report(reports: List[Dict[str, Any]], errors: List[str]) -> str:
    """Human-readable summary for the CLIs."""
    lines = []
    for r in reports:
        mb = r["train_state_bytes"] / 2**20
        lines.append(
            f"{r['name']}: {r['task']} B={r['batch_size']} "
            f"epochs={r['epochs']} lr={r['lr']:g} | "
            f"{r['n_params']:,} params, train state ~{mb:.1f} MiB"
        )
        if "pretrain_leaves_matched" in r:
            c, n = r["pretrain_leaves_matched"]
            lines.append(f"  pretrained checkpoint: {c}/{n} leaves matched")
        for note in r["notes"]:
            lines.append(f"  {note}")
    for e in errors:
        lines.append(f"ERROR: {e}")
    lines.append(
        f"preflight: {len(reports)} run(s) OK, {len(errors)} error(s)"
    )
    return "\n".join(lines)
