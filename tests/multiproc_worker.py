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

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=seq, transformer_spectral_kwargs=seq,
        use_pallas=False,
    )
    ds = make_synthetic_dataset(n=64, n_max_lc=8, n_max_sp=8, seed=0)
    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=args.epochs, batch_size=16, lr=3e-3, seed=0,
                          noise_level_mag=1.0),
        run_dir=args.run_dir, mesh=mesh,
    )
    res = trainer.fit(ds.subset(np.arange(48)), ds.subset(np.arange(48, 64)))

    print("RESULT " + json.dumps({
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
