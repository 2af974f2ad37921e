"""End-to-end TPU training demonstration: full Trainer (scanned epochs,
augmentation, checkpoints, metrics) on synthetic bimodal data until the
contrastive retrieval AUC shows real learning. Writes a normal run dir.

    python benchmarks/train_demo_tpu.py [epochs]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main(epochs: int = 40):
    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    seq_lc = {"n_out": 32, "emb": 64, "heads": 8, "depth": 5,
              "time_norm": 20583.37, "agg": "attn", "dropout": 0.0}
    seq_sp = {"n_out": 32, "emb": 32, "heads": 2, "depth": 13,
              "time_norm": 17945.14, "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=32, nband=2,
        logit_scale_init=10.0, loss="softmax",
        transformer_kwargs=seq_lc, transformer_spectral_kwargs=seq_sp,
    )
    ds = make_synthetic_dataset(n=2048, n_max_lc=100, nband=2, n_max_sp=220,
                                seed=0)
    train, val = ds.subset(np.arange(1792)), ds.subset(np.arange(1792, 2048))
    trainer = Trainer(
        CLIPModel(cfg), task="contrastive",
        cfg=TrainerConfig(epochs=epochs, batch_size=256, lr=5e-4, seed=0,
                          noise_level_mag=1.0, patience=10**9),
        run_dir="analysis/tpu_demo/run-0",
    )
    res = trainer.fit(train, val)
    aucs = [m.get("AUC_val") for m in res["metric_rows"]]
    print(json.dumps({
        "epochs": res["epochs_run"],
        "wall_s": round(res["wall_time_s"], 1),
        "train_loss_first": round(res["history"]["train_loss"][0], 4),
        "train_loss_last": round(res["history"]["train_loss"][-1], 4),
        "auc_first": round(aucs[0], 4),
        "auc_last": round(aucs[-1], 4),
        "auc_best": round(max(aucs), 4),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
