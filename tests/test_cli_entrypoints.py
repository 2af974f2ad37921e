"""The packaged CLI surface (multimodal_supernovae_tpu/cli/).

Every command ships inside the package — a pip install exposes it as an
``mmsn-*`` console script plus the ``mmsn`` umbrella (pyproject
``[project.scripts]``), and ``python -m multimodal_supernovae_tpu`` works
anywhere the package imports. The repo's ``scripts/*.py`` launchers must
stay behaviorally identical (the reference-style invocation —
/root/reference/README.md "python script_wandb.py ...").
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

import pytest

from multimodal_supernovae_tpu import cli

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_every_command_resolves_to_a_main():
    for name, (module, help_line) in cli.COMMANDS.items():
        mod = importlib.import_module(f"multimodal_supernovae_tpu.cli.{module}")
        assert callable(getattr(mod, "main", None)), name
        assert help_line


def test_pyproject_entry_points_match_commands():
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert scripts["mmsn"] == "multimodal_supernovae_tpu.cli:main"
    for name, (module, _) in cli.COMMANDS.items():
        target = scripts[f"mmsn-{name}"]
        mod_path, func = target.split(":")
        assert mod_path == f"multimodal_supernovae_tpu.cli.{module}"
        assert callable(getattr(importlib.import_module(mod_path), func))
    # nothing stale the other way either
    assert set(scripts) == {"mmsn"} | {f"mmsn-{n}" for n in cli.COMMANDS}


def test_every_command_has_a_repo_launcher():
    for name, (module, _) in cli.COMMANDS.items():
        path = os.path.join(REPO, "scripts", f"{module}.py")
        assert os.path.exists(path), path
        src = open(path).read()
        assert f"multimodal_supernovae_tpu.cli.{module}" in src


def test_umbrella_help_and_unknown(capsys):
    assert cli.main([]) == 0
    assert cli.main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "commands:" in out and "pretrain-sim" in out
    assert cli.main(["not-a-command"]) == 2
    err = capsys.readouterr().err
    assert "unknown command" in err


def test_umbrella_dispatch_restores_argv(capsys):
    before = list(sys.argv)
    with pytest.raises(SystemExit) as e:
        cli.main(["fetch-data", "--help"])
    assert e.value.code == 0
    assert sys.argv == before
    assert "mmsn fetch-data" in capsys.readouterr().out  # prog name threads


def test_python_dash_m_entry():
    proc = subprocess.run(
        [sys.executable, "-m", "multimodal_supernovae_tpu", "--help"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "commands:" in proc.stdout
