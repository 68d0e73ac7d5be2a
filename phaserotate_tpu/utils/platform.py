"""Backend platform selection for subprocess entry points.

The environment's TPU plugin may force its platform at interpreter
startup (it imports jax from a ``.pth`` hook and overrides
``JAX_PLATFORMS``), so an env var alone cannot pin a subprocess to the
CPU backend.  Every CLI entry point (hostapp, bridge daemon, phase-rotate
CLI) calls :func:`apply_platform_env` first: if ``PHASEROTATE_TPU_PLATFORM``
is set, the jax config is updated after imports — the last write wins.

The test suite sets ``PHASEROTATE_TPU_PLATFORM=cpu`` (tests/conftest.py)
so spawned subprocesses never contend for the single tunneled TPU chip.
Production leaves it unset and gets the default (TPU) backend.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]

ENV_VAR = "PHASEROTATE_TPU_PLATFORM"


def apply_platform_env() -> None:
    plat = os.environ.get(ENV_VAR, "").strip()
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        n = os.environ.get(ENV_VAR + "_NDEV", "").strip()
        if n and plat == "cpu":
            jax.config.update("jax_num_cpu_devices", int(n))
    except RuntimeError:
        pass  # backend already initialized; nothing more we can do
