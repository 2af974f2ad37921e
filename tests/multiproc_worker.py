"""Worker for the multi-process (multi-host) CPU dryrun test.

Launched once per simulated host by tests/test_multiprocess.py with
MMSN_COORDINATOR / MMSN_NUM_PROCESSES / MMSN_PROCESS_ID set. Each process
owns `--local-devices` virtual CPU chips; together they form one global JAX
runtime, standing in for a multi-host TPU pod (each process = one 'slice',
collectives between them = DCN). Trains a small contrastive CLIP model over
the global (data, model) mesh and prints the loss history as JSON.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_disable_most_optimizations", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n-model", type=int, default=1)
    ap.add_argument("--run-dir", default=None,
                    help="exercise multi-host checkpointing/sidecars")
    ap.add_argument("--exit-skew", type=float, default=0.0,
                    help="seconds process 0 stalls in its post-fit checkpoint "
                         "close — reproduces the exit-skew hazard where a "
                         "fast rank reaches interpreter exit while rank 0 "
                         "still writes (round-2 DEADLINE_EXCEEDED flake)")
    ap.add_argument("--ensemble", action="store_true",
                    help="run fit_members with the member axis sharded over "
                         "the global data axis instead of Trainer.fit "
                         "(exercises the multi-process DCN readback path)")
    args = ap.parse_args()

    jax.config.update("jax_num_cpu_devices", args.local_devices)

    from multimodal_supernovae_tpu.parallel import distributed

    started = distributed.initialize()
    assert started, "worker requires MMSN_* distributed env"

    import numpy as np

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    mesh = distributed.make_global_mesh(n_model=args.n_model)

    if args.exit_skew > 0 and jax.process_index() == 0:
        # Inject skew INSIDE fit's exit sequence, before the fit_end barrier:
        # rank 0 stalls in CheckpointManager.close while other ranks finish
        # instantly. Without trainer._fit_end_barrier the fast rank tears
        # down the coordination service mid-write.
        import time as _time

        from multimodal_supernovae_tpu.training import trainer as trainer_mod

        real_close = trainer_mod.CheckpointManager.close

        def slow_close(self):
            _time.sleep(args.exit_skew)
            real_close(self)

        trainer_mod.CheckpointManager.close = slow_close

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=seq, transformer_spectral_kwargs=seq,
        use_pallas=False,
    )
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=0)

    if args.ensemble:
        # 4 members sharded member-per-device over the 4-device data axis,
        # across 2 OS processes: losses/metrics read back over DCN
        # (training/ensemble._to_host), results identical on every process.
        from multimodal_supernovae_tpu.training.ensemble import (
            Member,
            fit_members,
        )

        idx = np.arange(64)
        members = [
            Member(f"run-{i}", i, np.roll(idx, 16 * i)[:48],
                   np.roll(idx, 16 * i)[48:])
            for i in range(4)
        ]
        res = fit_members(
            CLIPModel(cfg), "contrastive",
            TrainerConfig(epochs=args.epochs, batch_size=16, lr=3e-3,
                          seed=0, noise_level_mag=1.0),
            ds, members, mesh=mesh,
        )
        print("RESULT " + json.dumps({
            "process": jax.process_index(),
            "n_processes": jax.process_count(),
            "global_devices": len(jax.devices()),
            "mesh_shape": dict(mesh.shape),
            "members": {
                m.name: {
                    "train_loss": res["members"][m.name]["history"]["train_loss"],
                    "val_loss": res["members"][m.name]["history"]["val_loss"],
                    "auc": [r["AUC_val"]
                            for r in res["members"][m.name]["metric_rows"]
                            if "AUC_val" in r],
                }
                for m in members
            },
        }), flush=True)
        return

    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=args.epochs, batch_size=16, lr=3e-3, seed=0,
                          noise_level_mag=1.0),
        run_dir=args.run_dir, mesh=mesh,
    )
    res = trainer.fit(ds.subset(np.arange(48)), ds.subset(np.arange(48, 64)))

    # fetch_global_scalar: the replicated-readback helper must return the
    # true value once (not N times) on every process, and reject sharded
    # inputs instead of silently dropping data (ADVICE r2/r3).
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = jax.jit(
        lambda: jnp.full((4,), 2.5), out_shardings=NamedSharding(mesh, P())
    )()
    fetched = distributed.fetch_global_scalar(rep)
    assert fetched == 10.0, fetched
    n_dev = len(jax.devices())
    sharded = jax.jit(
        lambda: jnp.arange(float(n_dev)),
        out_shardings=NamedSharding(mesh, P(distributed.DATA_AXIS)),
    )()
    if jax.process_count() > 1:
        try:
            distributed.fetch_global_scalar(sharded)
            raise AssertionError("sharded input must be rejected")
        except ValueError:
            pass

    print("RESULT " + json.dumps({
        "fetch_scalar": fetched,
        "process": jax.process_index(),
        "n_processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "mesh_shape": dict(mesh.shape),
        "train_loss": res["history"]["train_loss"],
        "val_loss": res["history"]["val_loss"],
        "best_ckpt_epoch": res.get("best_ckpt_epoch"),
    }), flush=True)


if __name__ == "__main__":
    main()
