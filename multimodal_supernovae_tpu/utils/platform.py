"""Backend/platform selection helper.

In some managed environments a sitecustomize hook registers the TPU plugin
and forces the platform at interpreter start, so the ``JAX_PLATFORMS`` env
var is ignored. ``select_platform`` must run before any backend-initialising
jax call; it wins over both the env var and the hook."""

from __future__ import annotations

from typing import Optional


def select_platform(platform: Optional[str], num_cpu_devices: Optional[int] = None):
    """platform: 'cpu' | 'tpu' | None (leave the environment's default)."""
    if platform is None:
        return
    import os

    import jax

    if platform == "tpu":
        env = os.environ.get("JAX_PLATFORMS", "")
        if env and env not in ("cpu", "tpu"):
            # The environment routes TPU access through a PJRT plugin under
            # its own platform name (e.g. a tunnelled backend); forcing the
            # literal 'tpu' platform would select the native libtpu path,
            # which has no local chip. Honour the plugin instead.
            jax.config.update("jax_platforms", env)
            return
    jax.config.update("jax_platforms", platform)
    if platform == "cpu" and num_cpu_devices:
        jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
