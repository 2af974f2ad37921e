"""Native (C++) data-ingest bindings.

``fastcsv`` is a small C++ CSV parser (data/native/fastcsv.cpp) built as a
shared library and bound via ctypes; it replaces pandas in the ingest hot
loop (thousands of small light-curve/spectra CSVs). Falls back cleanly when
the library hasn't been built (``make -C multimodal_supernovae_tpu/data/native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfastcsv.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fastcsv_parse.restype = ctypes.c_void_p
        lib.fastcsv_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fastcsv_ncols.restype = ctypes.c_int
        lib.fastcsv_ncols.argtypes = [ctypes.c_void_p]
        lib.fastcsv_nrows.restype = ctypes.c_longlong
        lib.fastcsv_nrows.argtypes = [ctypes.c_void_p]
        lib.fastcsv_colname.restype = ctypes.c_char_p
        lib.fastcsv_colname.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fastcsv_col_is_numeric.restype = ctypes.c_int
        lib.fastcsv_col_is_numeric.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fastcsv_copy_numeric.restype = None
        lib.fastcsv_copy_numeric.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.fastcsv_string_item.restype = ctypes.c_char_p
        lib.fastcsv_string_item.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_longlong,
        ]
        lib.fastcsv_free.restype = None
        lib.fastcsv_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def ensure_built(timeout: float = 120.0) -> bool:
    """Build ``libfastcsv.so`` in place (``make``) when it is missing and a
    C++ toolchain exists; returns whether the library is now loadable.

    Idempotent and safe to call from test harnesses — the ingest path
    otherwise silently falls back to pandas forever, leaving a shipped
    component dark (round-2 review, Missing #4)."""
    if os.path.exists(_LIB_PATH):
        return True
    import shutil
    import subprocess

    if shutil.which(os.environ.get("CXX", "g++")) is None:
        return False
    if shutil.which("make") is None:
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            check=True, capture_output=True, timeout=timeout,
        )
    except (subprocess.SubprocessError, OSError):
        return False
    return os.path.exists(_LIB_PATH)


def available() -> bool:
    return _load() is not None


def read_csv(path: str, header: bool = True) -> Dict[str, np.ndarray]:
    """Parse a CSV into {column name (or index): array}.

    Numeric columns come back float64 (empty cells = NaN); non-numeric
    columns as object arrays of str.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastcsv.so not built")
    handle = lib.fastcsv_parse(path.encode(), 1 if header else 0)
    if not handle:
        raise IOError(f"fastcsv failed to parse {path}")
    try:
        ncols = lib.fastcsv_ncols(handle)
        nrows = lib.fastcsv_nrows(handle)
        out: Dict[str, np.ndarray] = {}
        for c in range(ncols):
            raw_name = lib.fastcsv_colname(handle, c)
            name = raw_name.decode() if header else str(c)
            if lib.fastcsv_col_is_numeric(handle, c):
                buf = np.empty(nrows, dtype=np.float64)
                lib.fastcsv_copy_numeric(
                    handle, c, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
                )
                out[name] = buf
            else:
                out[name] = np.array(
                    [
                        lib.fastcsv_string_item(handle, c, r).decode()
                        for r in range(nrows)
                    ],
                    dtype=object,
                )
        return out
    finally:
        lib.fastcsv_free(handle)
