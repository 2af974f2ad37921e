"""XLA compiler-option sweep at the flagship B=1024 batch.

The round-3 trace diagnosis (benchmarks/PERF.md) showed the B=1024 excess
is HBM-spilled intermediate traffic: tensors that XLA's memory-space
assignment (MSA) keeps VMEM-resident (S(1)) at B=256 spill at B=1024.
This probe sweeps the MSA/TPU compiler options that control exactly that
budget and the spill-copy overlap, via per-compile env_option_overrides
(flag names read out of this image's libtpu.so):

  - xla_vf_max_vmem_used_by_memory_space_assignment: the MSA VMEM budget
  - xla_vf_vmem_max_outstanding_prefetches/evictions: async-copy depth
  - xla_tpu_alternate_memory_benefit_scaling_factor_for_large_buffers:
    bias MSA toward exactly the 26 MB-per-layer buffers that spill
  - xla_tpu_enable_vmem_to_vmem_dmas

Usage: python benchmarks/probe_xla_flags.py [batch] [steps]
Writes benchmarks/probe_xla_flags.json. Each variant is a fresh compile
(~40-80 s over the tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import bench


VARIANTS = {
    "baseline": {},
    "msa_budget_112mb": {
        "xla_vf_max_vmem_used_by_memory_space_assignment": "117440512",
    },
    "msa_budget_96mb": {
        "xla_vf_max_vmem_used_by_memory_space_assignment": "100663296",
    },
    "msa_overlap_deep": {
        "xla_vf_vmem_max_outstanding_prefetches": "32",
        "xla_vf_vmem_max_outstanding_evictions": "32",
    },
    "msa_large_buffer_bias": {
        "xla_tpu_alternate_memory_benefit_scaling_factor_for_large_buffers":
            "8.0",
    },
    "vmem_to_vmem_dmas": {
        "xla_tpu_enable_vmem_to_vmem_dmas": "true",
    },
    "combo_budget_overlap": {
        "xla_vf_max_vmem_used_by_memory_space_assignment": "117440512",
        "xla_vf_vmem_max_outstanding_prefetches": "32",
        "xla_vf_vmem_max_outstanding_evictions": "32",
    },
}


def main():
    import jax

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    scans = 3

    setup = bench.build_setup(batch, None, steps)
    state, data, plan, key = (setup["state"], setup["data"], setup["plan"],
                              setup["key"])
    run_epoch = setup["run_epoch"]
    lowered = run_epoch.lower(state, data, plan, key)

    results = {}
    for name, opts in VARIANTS.items():
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
            state2, losses = compiled(state, data, plan, key)
            float(losses.sum())
            times = []
            for _ in range(scans):
                t0 = time.perf_counter()
                state2, losses = compiled(state2, data, plan, key)
                float(losses.sum())
                times.append(time.perf_counter() - t0)
            results[name] = {
                "step_ms": round(min(times) / steps * 1e3, 2),
                "samples_per_s": round(batch / (min(times) / steps)),
                "compile_s": round(compile_s, 1),
                "loss": round(float(losses[-1]), 4),
                "options": opts,
                "harness": {"steps_per_scan": steps, "scans": scans,
                            "sync": "value-fetch", "round": "r3",
                            "batch": batch},
            }
        except Exception as e:  # record per-variant failures, keep sweeping
            results[name] = {"error": str(e)[:240], "options": opts}
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(__file__), "probe_xla_flags.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
