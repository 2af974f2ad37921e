"""Worker for the kill-resume (preemption) test.

Trains a small contrastive model into ``--run-dir``. With ``--kill-marker``
set, the process SIGKILLs ITSELF while logging epoch ``--kill-after-epoch``
— i.e. after that epoch's metrics row is written but BEFORE its checkpoint
is saved, so the epoch in flight is genuinely lost and must be re-done on
resume (the preemption case, not a clean epoch-boundary stop). The marker
file makes the kill fire exactly once across supervisor relaunches.

On completion it writes ``final.npz`` (every param leaf) for bit-identity
comparison against an uninterrupted run.
"""

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_disable_most_optimizations", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--kill-marker", default=None)
    ap.add_argument("--kill-after-epoch", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig
    from multimodal_supernovae_tpu.utils import logging as mmsn_logging

    if args.kill_marker and not os.path.exists(args.kill_marker):
        marker, kill_epoch = args.kill_marker, args.kill_after_epoch
        real_log = mmsn_logging.MetricsLogger.log

        def log_then_die(self, metrics, step=None):
            real_log(self, metrics, step=step)
            if metrics.get("epoch") == kill_epoch:
                open(marker, "w").write("killed\n")
                os.kill(os.getpid(), signal.SIGKILL)

        mmsn_logging.MetricsLogger.log = log_then_die

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1000.0,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        loss="softmax", transformer_kwargs=seq,
        transformer_spectral_kwargs=seq, use_pallas=False,
    )
    ds = make_synthetic_dataset(n=32, n_max_lc=8, n_max_sp=8, seed=0)
    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=args.epochs, batch_size=8, lr=3e-3, seed=0,
                          noise_level_mag=1.0),
        run_dir=args.run_dir,
    )
    res = trainer.fit(ds.subset(np.arange(24)), ds.subset(np.arange(24, 32)),
                      resume=args.resume)

    leaves = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(res["state"].params):
        leaves[jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez(os.path.join(args.run_dir, "final.npz"), **leaves)
    print("WORKER DONE", flush=True)


if __name__ == "__main__":
    main()
