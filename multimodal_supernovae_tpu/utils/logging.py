"""Run metrics logging: JSONL on disk, console, optional Weights & Biases.

The reference's observability backbone is W&B (SURVEY.md §5.5). Here the
load-bearing sink is a local ``metrics.jsonl`` per run (machine-readable,
no network dependency); W&B attaches opportunistically when the package and
credentials exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False, wandb_kwargs=None):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None
        self.summary: Dict[str, Any] = {}

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        row = {k: _to_py(v) for k, v in metrics.items()}
        if step is not None:
            row["step"] = step
        row["time"] = time.time()
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def set_summary(self, **kv) -> None:
        self.summary.update({k: _to_py(v) for k, v in kv.items()})
        with open(self.path.replace("metrics.jsonl", "summary.json"), "w") as f:
            json.dump(self.summary, f, indent=2)
        if self._wandb is not None:
            for k, v in kv.items():
                self._wandb.summary[k] = v

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
