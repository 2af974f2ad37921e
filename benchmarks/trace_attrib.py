"""Device-trace attribution of the headline train step at any batch size.

Runs EXACTLY bench.py's scanned step (shared ``bench.build_setup``) under
``jax.profiler.trace`` and parses the gzipped Chrome trace the tunnel
writes (plugins/profile/STAMP/NAME.trace.json.gz — a real TPU lane with
per-HLO durations and long_name shapes/layouts). Groups op time into
categories and prints ms/step per category plus the top individual ops.

Usage: python benchmarks/trace_attrib.py [batch] [steps_per_scan]
Writes benchmarks/trace_attrib_b{batch}.json with harness provenance.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


CATEGORIES = [
    # (category, regex on op name)
    ("flash_attention", re.compile(r"custom-call|fwd_kernel|bwd_kernel|tpu_custom_call")),
    ("layout_copy", re.compile(r"^(copy|transpose|bitcast)")),
    ("convert", re.compile(r"^convert")),
    ("gather_scatter", re.compile(r"gather|scatter|dynamic-slice|dynamic-update")),
    ("convolution", re.compile(r"^convolution")),
    ("matmul", re.compile(r"^dot")),
    ("reduce", re.compile(r"^(reduce|all-reduce)")),
    ("fusion", re.compile(r"^(fusion|loop_fusion|input_fusion|output_fusion)")),
]


def classify(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def parse_trace(logdir: str, steps: int):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: processes whose metadata name mentions TPU; fall back to
    # the pid with the largest total X-event duration
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    durs_by_pid = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            durs_by_pid.setdefault(e["pid"], 0.0)
            durs_by_pid[e["pid"]] += e["dur"]
    tpu_pids = [p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "vm" in n.lower()]
    if not tpu_pids and durs_by_pid:
        tpu_pids = [max(durs_by_pid, key=durs_by_pid.get)]

    by_cat, by_op = {}, {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0.0)  # microseconds
        total += dur
        cat = classify(name)
        by_cat[cat] = by_cat.get(cat, 0.0) + dur
        base = name.split(".")[0]
        by_op[base] = by_op.get(base, 0.0) + dur
    to_ms = lambda us: us / 1e3 / steps
    return {
        "device_lanes": {p: pid_names.get(p, "?") for p in tpu_pids},
        # the real step time: the scan's `while` op spans exactly the body.
        # (The events form a flame graph — jit wrapper > while > ops — so a
        # SUM over all X events counts every nesting level and is ~4x the
        # step; it is kept only as a parse-sanity figure.)
        "scan_body_ms_per_step": round(to_ms(by_op.get("while", 0.0)), 3),
        "nested_events_sum_ms_per_step": round(to_ms(total), 3),
        "by_category_ms": {k: round(to_ms(v), 3)
                           for k, v in sorted(by_cat.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops_ms": {k: round(to_ms(v), 3)
                       for k, v in sorted(by_op.items(),
                                          key=lambda kv: -kv[1])[:25]},
    }


def main(batch: int = 256, steps: int = 64):
    import jax

    from bench import build_setup

    setup = build_setup(batch, steps_per_scan=steps)
    run_epoch = setup["run_epoch"]
    state, data, plan, key = (setup["state"], setup["data"], setup["plan"],
                              setup["key"])
    # compile + warmup (value fetch = the only true barrier on this backend)
    state, losses = run_epoch(state, data, plan, key)
    float(losses.sum())

    logdir = tempfile.mkdtemp(prefix=f"trace_b{batch}_")
    jax.profiler.start_trace(logdir)
    state, losses = run_epoch(state, data, plan, key)
    float(losses.sum())
    jax.profiler.stop_trace()

    report = parse_trace(logdir, steps)
    report["harness"] = {
        "batch": batch, "steps_per_scan": steps, "dtype": setup["dtype"],
        "sync": "value-fetch", "trace_dir": logdir,
        "source": "bench.build_setup (identical to headline bench)",
    }
    out = os.path.join(os.path.dirname(__file__),
                       f"trace_attrib_b{batch}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(b, s)
