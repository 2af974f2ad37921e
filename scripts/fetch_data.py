#!/usr/bin/env python
"""Launcher for ``multimodal_supernovae_tpu.cli.fetch_data`` (see its docstring).

The implementation ships inside the package so pip installs expose it as
the ``mmsn-fetch-data`` console script and ``mmsn fetch-data``; this file keeps
``python scripts/fetch_data.py ...`` working from a source checkout.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from multimodal_supernovae_tpu.cli.fetch_data import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
