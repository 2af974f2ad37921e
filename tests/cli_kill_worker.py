"""SIGKILL-injection wrapper around the REAL training CLIs.

Runs ``scripts/<cli>.py`` with the given argv, after patching
``MetricsLogger.log`` to SIGKILL the process right after the metrics row
for ``--kill-after-epoch`` is written — i.e. before that epoch's
checkpoint lands, so the epoch in flight is genuinely lost (a pod
preemption, not a clean stop). The marker file makes the kill fire exactly
once across supervisor relaunches.

Used by tests/test_cli_kill_resume.py to prove that supervising ANY of the
training CLIs (scripts/supervise.py appending --resume) reproduces an
uninterrupted run bit-for-bit.

  python cli_kill_worker.py --cli pretrain_sim --kill-marker M \
      --kill-after-epoch 2 -- <cli args...>
"""

import argparse
import os
import runpy
import signal
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_disable_most_optimizations", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cli", required=True,
                    choices=["train", "pretrain_sim", "finetune_clip",
                             "pretrain_masked"])
    ap.add_argument("--kill-marker", default=None)
    ap.add_argument("--kill-after-epoch", type=int, default=2)
    ap.add_argument("cli_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cli_args = args.cli_args
    if cli_args and cli_args[0] == "--":
        cli_args = cli_args[1:]

    if args.kill_marker and not os.path.exists(args.kill_marker):
        from multimodal_supernovae_tpu.utils import logging as mmsn_logging

        marker, kill_epoch = args.kill_marker, args.kill_after_epoch
        real_log = mmsn_logging.MetricsLogger.log

        def log_then_die(self, metrics, step=None):
            real_log(self, metrics, step=step)
            if metrics.get("epoch") == kill_epoch:
                open(marker, "w").write("killed\n")
                os.kill(os.getpid(), signal.SIGKILL)

        mmsn_logging.MetricsLogger.log = log_then_die

    script = os.path.join(REPO, "scripts", f"{args.cli}.py")
    sys.argv = [script] + cli_args
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
