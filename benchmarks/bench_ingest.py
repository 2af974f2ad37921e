"""Ingest-layer benchmark: native C++ CSV parser vs pandas.

The ingest layer parses thousands of small light-curve/spectra CSVs once per
corpus (data/ztfbts.py). This measures per-file parse throughput on a
generated fixture corpus. Run: python benchmarks/bench_ingest.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tests")))


def main(n_files: int = 300):
    from fixtures import write_mini_ztfbts

    from multimodal_supernovae_tpu.data import native

    with tempfile.TemporaryDirectory() as tmp:
        data_dir, _, ids = write_mini_ztfbts(tmp, n=n_files, seed=0,
                                             with_images=False,
                                             with_spectra=False)
        paths = [os.path.join(data_dir, "light-curves", f"{i}.csv") for i in ids]

        import pandas as pd

        t0 = time.perf_counter()
        rows_pd = sum(len(pd.read_csv(p)) for p in paths)
        t_pandas = time.perf_counter() - t0

        if not native.available():
            print(json.dumps({"error": "libfastcsv.so not built"}))
            return
        t0 = time.perf_counter()
        rows_nat = 0
        for p in paths:
            cols = native.read_csv(p, header=True)
            rows_nat += len(cols["time"])
        t_native = time.perf_counter() - t0
        assert rows_pd == rows_nat

        # parity spot-check on one file
        cols = native.read_csv(paths[0], header=True)
        df = pd.read_csv(paths[0])
        np.testing.assert_allclose(cols["mag"], df["mag"].to_numpy())

        print(json.dumps({
            "files": n_files,
            "rows": rows_pd,
            "pandas_s": round(t_pandas, 3),
            "native_s": round(t_native, 3),
            "speedup": round(t_pandas / t_native, 1),
        }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
