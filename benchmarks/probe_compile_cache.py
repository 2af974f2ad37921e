#!/usr/bin/env python
"""Measure what the persistent compilation cache saves at product scale.

Runs the EXACT headline train step (bench.build_setup, maven-lite shapes,
B=256 bf16) in two fresh subprocesses sharing one cache dir and times the
first-execution wall (trace + compile + one scan): the cold process pays
the remote XLA compile; the warm process reads the serialized executable
from disk. This is the compile every sweep grid point, supervise.py
restart, and --resume re-entry would otherwise re-pay
(utils/compile_cache.py; reference counterpart: none — torch-Lightning has
no compile step, but the reference re-pays dataset setup per run instead).

Writes benchmarks/probe_compile_cache.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_CHILD = """
import time, sys
t_proc = time.perf_counter()
from multimodal_supernovae_tpu.utils.compile_cache import (
    enable_compilation_cache,
)
enable_compilation_cache()
sys.path.insert(0, %(repo)r)
import bench
setup = bench.build_setup(256, "bfloat16", 64)
t0 = time.perf_counter()
state2, losses = setup["run_epoch"](setup["state"], setup["data"],
                                    setup["plan"], setup["key"])
loss = float(losses.sum())
t1 = time.perf_counter()
print("FIRST_EXEC_S", t1 - t0)
print("PROC_WALL_S", t1 - t_proc)
print("LOSS", loss)
"""


def run_child(cache_dir):
    env = dict(os.environ)
    env["MMSN_COMPILE_CACHE_DIR"] = cache_dir
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", _CHILD % {"repo": REPO}],
                         capture_output=True, text=True, env=env, cwd=REPO,
                         timeout=1800)
    wall = time.perf_counter() - t0
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    vals = {}
    for line in out.stdout.splitlines():
        parts = line.split()
        if parts and parts[0] in ("FIRST_EXEC_S", "PROC_WALL_S", "LOSS"):
            vals[parts[0].lower()] = float(parts[1])
    vals["subprocess_wall_s"] = wall
    return vals


def main():
    with tempfile.TemporaryDirectory(prefix="mmsn_cc_probe") as cache:
        cold = run_child(cache)
        n_entries = sum(len(fs) for _, _, fs in os.walk(cache))
        warm = run_child(cache)
    result = {
        "what": "first execution (trace+compile+1 scan of 64 steps) of the "
                "exact headline train step, cold vs warm persistent "
                "compilation cache, fresh process each",
        "cold": cold, "warm": warm, "cache_entries": n_entries,
        "compile_saved_s": round(cold["first_exec_s"] - warm["first_exec_s"],
                                 2),
        "loss_identical": cold["loss"] == warm["loss"],
    }
    out = os.path.join(os.path.dirname(__file__), "probe_compile_cache.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
