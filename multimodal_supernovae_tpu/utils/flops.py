"""Analytic model-FLOP accounting for MFU reporting.

MFU = (model FLOPs executed per second) / (chip peak FLOP/s). The FLOP
count is analytic from the architecture (matmul-dominated terms only —
elementwise/LN/softmax omitted, so reported MFU is a slight lower bound)
and the train step is costed at the standard 3x forward (1 fwd + 2 bwd
matmul passes).

Peak numbers are dense-matmul peaks per chip; on TPU, f32 matmuls run
through the MXU at bf16-input rate under JAX's DEFAULT precision, so the
bf16 peak is the right denominator for both dtypes here.
"""

from __future__ import annotations

from typing import Dict

# dense peak FLOP/s per chip (bf16 inputs, f32 accumulate)
PEAK_FLOPS = {
    "tpu v5e": 197e12,
    "tpu v5 lite": 197e12,  # v5e's platform name in some stacks
    "tpu v4": 275e12,
    "tpu v6e": 918e12,
    "cpu": 1e11,  # nominal, for smoke runs only
}


def transformer_tower_flops(
    seq_len: int, emb: int, depth: int, ff_hidden_mult: int = 4,
    n_out: int = 0,
) -> int:
    """Forward matmul FLOPs for ONE sample through a post-norm tower.

    Per block: q/k/v/unify projections (4 matmuls of (T,e)x(e,e)), the
    attention score/apply pair ((T,T)x(T,e) twice, all heads together), and
    the 2-layer ReLU MLP of width ff_hidden_mult*e. A matmul of (m,k)x(k,n)
    counts 2*m*k*n FLOPs.
    """
    t, e = seq_len, emb
    per_block = (
        4 * 2 * t * e * e          # kqv + unify
        + 2 * 2 * t * t * e        # scores + apply (summed over heads)
        + 2 * 2 * t * e * ff_hidden_mult * e  # ff in + out
    )
    head = 2 * t * e + (2 * e * n_out if n_out else 0)  # embed + projection
    return depth * per_block + head


def clip_train_step_flops(cfg, batch_size: int, t_lc: int, t_sp: int) -> int:
    """Model FLOPs for one optimizer step of the bimodal contrastive
    configuration (fwd + bwd = 3x fwd)."""
    tk, sk = dict(cfg.transformer_kwargs), dict(cfg.transformer_spectral_kwargs)
    fwd = 0
    if "lightcurve" in cfg.combinations:
        fwd += transformer_tower_flops(
            t_lc, tk["emb"], tk["depth"],
            tk.get("ff_hidden_mult", 4), tk["n_out"],
        )
    if "spectral" in cfg.combinations:
        fwd += transformer_tower_flops(
            t_sp, sk["emb"], sk["depth"],
            sk.get("ff_hidden_mult", 4), sk["n_out"],
        )
    return 3 * batch_size * fwd


def chip_peak_flops() -> float:
    """Peak FLOP/s of the attached chip (by device_kind), or the CPU
    nominal."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for name, peak in PEAK_FLOPS.items():
        if name in kind or kind in name:
            return peak
    return PEAK_FLOPS["cpu"] if "cpu" in kind else 197e12


def mfu(step_flops: int, step_time_s: float, n_chips: int = 1) -> Dict[str, float]:
    peak = chip_peak_flops() * n_chips
    achieved = step_flops / step_time_s
    return {
        "model_tflops_per_s": achieved / 1e12,
        "peak_tflops_per_s": peak / 1e12,
        "mfu_pct": 100.0 * achieved / peak,
    }
