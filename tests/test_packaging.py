"""The wheel ships a working framework (pyproject packaging contract).

Builds the wheel offline (--no-build-isolation), installs it into a
scratch --target dir, and drives the installed copy: every mmsn-* console
script materializes, the umbrella runs, `mmsn train --check` preflights a
real sweep YAML end-to-end from the installed code, and the native C++
CSV source ships and builds in place via ensure_built.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pkg")
    wheel_dir = tmp / "wheel"
    target = tmp / "site"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--wheel-dir", str(wheel_dir), REPO],
        check=True, capture_output=True, timeout=600,
    )
    wheels = list(wheel_dir.glob("*.whl"))
    assert len(wheels) == 1
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--target",
         str(target), str(wheels[0])],
        check=True, capture_output=True, timeout=600,
    )
    return wheels[0], target


def _env(target):
    env = dict(os.environ)
    # keep the axon site shim importable (environment rule) but put the
    # installed tree first so it, not the repo, provides the package
    env["PYTHONPATH"] = f"{target}{os.pathsep}" + env.get("PYTHONPATH", "")
    return env


def test_wheel_contents(installed):
    wheel, _ = installed
    names = zipfile.ZipFile(wheel).namelist()
    assert any(n.endswith("cli/train.py") for n in names)
    assert any(n.endswith("data/native/fastcsv.cpp") for n in names)
    assert any(n.endswith("data/native/Makefile") for n in names)
    entry = next(n for n in names if n.endswith("entry_points.txt"))
    text = zipfile.ZipFile(wheel).read(entry).decode()
    assert "mmsn = multimodal_supernovae_tpu.cli:main" in text
    assert "mmsn-train" in text and "mmsn-serve" in text


def test_console_scripts_materialize(installed):
    _, target = installed
    from multimodal_supernovae_tpu import cli

    scripts = {p.name for p in (target / "bin").iterdir()}
    assert "mmsn" in scripts
    assert {f"mmsn-{name}" for name in cli.COMMANDS} <= scripts


def test_installed_umbrella_and_preflight(installed, tmp_path):
    _, target = installed
    proc = subprocess.run(
        [sys.executable, str(target / "bin" / "mmsn"), "--help"],
        capture_output=True, text=True, timeout=300,
        env=_env(target), cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr
    assert "commands:" in proc.stdout
    proc = subprocess.run(
        [sys.executable, str(target / "bin" / "mmsn"), "train",
         os.path.join(REPO, "configs", "smoke.yaml"), "--check",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600,
        env=_env(target), cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "preflight: 1 run(s) OK, 0 error(s)" in proc.stdout


def test_installed_native_builds(installed, tmp_path):
    _, target = installed
    proc = subprocess.run(
        [sys.executable, "-c",
         "import multimodal_supernovae_tpu, os;"
         "from multimodal_supernovae_tpu.data import native;"
         "assert multimodal_supernovae_tpu.__file__.startswith("
         f"{str(target)!r}), multimodal_supernovae_tpu.__file__;"
         "print('built', native.ensure_built())"],
        capture_output=True, text=True, timeout=600,
        env=_env(target), cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr
    assert "built True" in proc.stdout
