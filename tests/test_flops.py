import numpy as np

from multimodal_supernovae_tpu.utils.flops import (
    clip_train_step_flops,
    mfu,
    transformer_tower_flops,
)


def test_tower_flops_closed_form():
    t, e, d = 10, 8, 2
    per_block = 4 * 2 * t * e * e + 2 * 2 * t * t * e + 2 * 2 * t * e * 4 * e
    want = d * per_block + 2 * t * e + 2 * e * 6
    assert transformer_tower_flops(t, e, d, 4, n_out=6) == want


def test_clip_step_flops_is_3x_fwd_and_scales_with_batch():
    from multimodal_supernovae_tpu.models import CLIPConfig

    seq = {"n_out": 8, "emb": 8, "heads": 2, "depth": 1, "time_norm": 1e3,
           "agg": "mean", "dropout": 0.0}
    cfg = CLIPConfig.create(
        combinations=("lightcurve", "spectral"), enc_dim=8, nband=2,
        transformer_kwargs=seq, transformer_spectral_kwargs=seq,
    )
    one = clip_train_step_flops(cfg, 1, t_lc=10, t_sp=12)
    fwd = transformer_tower_flops(10, 8, 1, 4, 8) + transformer_tower_flops(
        12, 8, 1, 4, 8
    )
    assert one == 3 * fwd
    assert clip_train_step_flops(cfg, 64, 10, 12) == 64 * one


def test_mfu_math():
    out = mfu(step_flops=197e12, step_time_s=1.0, n_chips=1)
    # on the CPU test backend the peak is the nominal 1e11
    assert out["model_tflops_per_s"] == 197.0
    assert out["mfu_pct"] > 0
    assert np.isfinite(out["peak_tflops_per_s"])
