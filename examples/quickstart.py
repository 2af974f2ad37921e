#!/usr/bin/env python
"""Library quickstart: train, evaluate, and reload a CLIP model in ~2 min.

Runs entirely on synthetic data so it works on any machine (CPU by
default; pass ``tpu`` to run on a chip). The same five calls scale to the
real corpus and a pod — swap ``make_synthetic_dataset`` for
``data.ztfbts.load_ztfbts`` and pass ``mesh=parallel.make_mesh()`` to the
Trainer. Full reference: docs/API.md; CLI equivalents: README Quick start.

    python examples/quickstart.py [tpu]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

# make the example runnable from a source checkout without installing
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    import jax

    jax.config.update("jax_platforms", platform)

    from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_supernovae_tpu.evaluation import get_embeddings, linear_probe
    from multimodal_supernovae_tpu.models import CLIPConfig, CLIPModel
    from multimodal_supernovae_tpu.models.factory import load_model
    from multimodal_supernovae_tpu.ops import retrieval_auc
    from multimodal_supernovae_tpu.training.trainer import Trainer, TrainerConfig

    # 1. data — fixed-shape host arrays + filename manifest
    ds = make_synthetic_dataset(n=96, n_max_lc=16, n_max_sp=24, seed=0)
    train, val = ds.subset(np.arange(72)), ds.subset(np.arange(72, 96))

    # 2. model — bimodal contrastive CLIP (light curves x spectra)
    seq = {"n_out": 16, "emb": 16, "heads": 2, "depth": 2,
           "time_norm": 1000.0, "agg": "mean", "dropout": 0.0}
    model = CLIPModel(CLIPConfig.create(
        combinations=("lightcurve", "spectral"),
        enc_dim=16, nband=2,
        transformer_kwargs=seq, transformer_spectral_kwargs=seq,
    ))

    # 3. train — one jitted scanned epoch; run dir gets the full
    #    config/split-manifest/orbax contract
    run_dir = tempfile.mkdtemp(prefix="mmsn-quickstart-")
    trainer = Trainer(
        model, task="contrastive",
        cfg=TrainerConfig(epochs=30, batch_size=24, lr=3e-3, seed=0,
                          noise_level_mag=1.0),
        run_dir=run_dir,
    )
    result = trainer.fit(train, val)
    losses = result["history"]["train_loss"]
    print(f"train loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"({len(losses)} epochs, run dir {run_dir})")
    assert losses[-1] < losses[0], "training did not learn"

    # 4. evaluate — embeddings, retrieval AUC, a linear redshift probe
    state = result["state"]
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    (emb_lc, emb_sp), _ = get_embeddings(model, variables, val)
    auc = float(np.asarray(retrieval_auc(emb_lc, emb_sp)))
    preds = linear_probe(np.asarray(emb_lc), val.arrays["redshift"],
                         np.asarray(emb_lc), task="regression")
    print(f"retrieval AUC {auc:.3f}; "
          f"probe MSE {float(np.mean((preds - val.arrays['redshift'])**2)):.4f}")

    # 5. reload — the run dir is self-describing (works on reference
    #    run dirs too; export back to torch via cli/export_torch.py).
    #    "last" == the final state above; "best" reloads the monitored
    #    optimum (orbax keeps best-2 + last).
    reloaded_model, reloaded_vars, *_ = load_model(
        run_dir, val.host_batch(np.arange(2)), which="last")
    (emb_lc2, _), _ = get_embeddings(reloaded_model, reloaded_vars, val)
    np.testing.assert_allclose(np.asarray(emb_lc2), np.asarray(emb_lc),
                               atol=1e-5)
    print("reloaded best checkpoint reproduces the embeddings — QUICKSTART OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
