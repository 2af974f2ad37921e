"""Persistent XLA compilation cache (utils/compile_cache.py).

The reference recompiles every program in every process (sweep grid
points, supervise.py restarts). The cache makes repeat compiles a disk
read; these tests pin the round-trip cross-process on the CPU backend and
the env-var controls.
"""

import os
import subprocess
import sys

from multimodal_supernovae_tpu.utils.compile_cache import (
    default_cache_dir,
    enable_compilation_cache,
)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# A tiny program compiled in a FRESH interpreter so the second process can
# only be fast via the on-disk cache, never via in-process caches. The
# min-compile-time gate is lowered because the probe compile is trivial;
# the CLIs keep jax's default gate (real compiles are 20-232 s).
_PROBE = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from multimodal_supernovae_tpu.utils.compile_cache import (
    enable_compilation_cache,
)
print("CACHE_DIR", enable_compilation_cache())
import logging
logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
import jax.numpy as jnp
print("RESULT", float(jax.jit(lambda x: (x @ x.T).sum())(
    jnp.ones((64, 64)))))
"""


def _run_probe(cache_dir, extra_env=None):
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    env["MMSN_COMPILE_CACHE_DIR"] = str(cache_dir)
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=180,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout + out.stderr


def test_cross_process_cache_hit(tmp_path):
    cache = tmp_path / "xla-cache"
    first = _run_probe(cache)
    assert f"CACHE_DIR {cache}" in first
    entries = [f for _, _, fs in os.walk(cache) for f in fs]
    assert entries, "first process wrote no cache entries"
    second = _run_probe(cache)
    assert "Persistent compilation cache hit" in second, second[-2000:]


def test_disabled_by_env(tmp_path):
    cache = tmp_path / "xla-cache"
    out = _run_probe(cache, {"MMSN_COMPILE_CACHE": "0"})
    assert "CACHE_DIR None" in out
    assert not cache.exists()


def test_dir_resolution(tmp_path, monkeypatch):
    # explicit arg wins over env; env wins over the default
    monkeypatch.setenv("MMSN_COMPILE_CACHE_DIR", str(tmp_path / "env"))
    assert enable_compilation_cache(str(tmp_path / "arg")) == str(
        tmp_path / "arg")
    assert enable_compilation_cache() == str(tmp_path / "env")
    monkeypatch.delenv("MMSN_COMPILE_CACHE_DIR")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    assert default_cache_dir() == str(
        tmp_path / "xdg" / "multimodal_supernovae_tpu" / "xla")
    # restore the suite's config (enable_compilation_cache mutated it)
    import jax

    jax.config.update("jax_compilation_cache_dir", None)


def test_unwritable_dir_is_nonfatal(tmp_path, monkeypatch):
    monkeypatch.delenv("MMSN_COMPILE_CACHE_DIR", raising=False)
    blocked = tmp_path / "blocked"
    blocked.write_text("a file, not a dir")
    assert enable_compilation_cache(str(blocked / "sub")) is None
