"""Shared plotting bootstrap: headless matplotlib or graceful no-op."""

from __future__ import annotations


def get_pyplot():
    """Return matplotlib.pyplot with the Agg backend, or None when
    matplotlib is unavailable (plot functions then no-op)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None
