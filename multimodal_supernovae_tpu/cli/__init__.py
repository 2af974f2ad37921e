"""Command-line entry points, shipped with the package.

Every CLI lives here as a submodule with a ``main()``; a pip install
exposes each as an ``mmsn-*`` console script (pyproject ``[project.scripts]``)
and all of them behind one umbrella command::

    mmsn train configs/maven-lite.yaml --parallel-folds
    python -m multimodal_supernovae_tpu train configs/maven-lite.yaml

The repo's ``scripts/*.py`` files are thin launchers over these modules, so
``python scripts/train.py ...`` (the reference-style invocation —
/root/reference README "Run the script: python script_wandb.py ...") keeps
working from a source checkout without installing.

The table maps each command to the reference workflow it replaces; see
MIGRATION.md for the side-by-side.
"""

from __future__ import annotations

import importlib
import sys
from typing import List, Optional

# command name -> (submodule, one-line help)
COMMANDS = {
    "train": ("train", "sweep/train on real data (script_wandb.py)"),
    "pretrain-sim": ("pretrain_sim",
                     "CLIP pretraining on simulations "
                     "(pretraining_clip_wandb.py); --streaming for >HBM"),
    "finetune-clip": ("finetune_clip",
                      "CLIP fine-tuning from a pretrained run "
                      "(finetune_clip.py)"),
    "pretrain-masked": ("pretrain_masked",
                        "masked (MAE) light-curve pretraining "
                        "(retraining_wandb.py)"),
    "evaluate": ("evaluate", "batch-evaluate finished runs "
                             "(evaluate_models.py)"),
    "infer": ("infer", "batch inference / embedding export over a run dir"),
    "serve": ("serve", "HTTP embedding service with dynamic micro-batching"),
    "export-model": ("export_model",
                     "AOT StableHLO serving artifact (params baked in)"),
    "export-embeddings": ("export_embeddings",
                          "embed a dataset with a finished run"),
    "export-torch": ("export_torch",
                     "export a run BACK to the reference's torch .ckpt"),
    "fetch-data": ("fetch_data",
                   "fetch + validate the ZTF BTS / simulation corpora"),
    "supervise": ("supervise",
                  "auto-restarting launcher for preemption-safe training"),
}


def _usage() -> str:
    width = max(len(k) for k in COMMANDS)
    lines = [f"  {k.ljust(width)}  {h}" for k, (_, h) in COMMANDS.items()]
    return (
        "usage: mmsn <command> [args...]   (or: python -m "
        "multimodal_supernovae_tpu <command> [args...])\n\ncommands:\n"
        + "\n".join(lines)
        + "\n\n`mmsn <command> --help` shows that command's arguments."
    )


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_usage())
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"mmsn: unknown command {cmd!r}\n\n{_usage()}", file=sys.stderr)
        return 2
    module = importlib.import_module(f".{COMMANDS[cmd][0]}", __package__)
    # the submodules' main() functions read sys.argv via argparse
    saved_argv = sys.argv
    sys.argv = [f"mmsn {cmd}"] + argv[1:]
    try:
        rc = module.main()
    finally:
        sys.argv = saved_argv
    return int(rc) if rc is not None else 0
