"""Backend platform pinning for entrypoints.

On hosts where a site hook force-registers an accelerator plugin and
rewrites ``JAX_PLATFORMS`` at interpreter startup (e.g. tunneled TPU
machines), the env var alone cannot force the CPU backend — only
``jax.config.update`` after import is authoritative. ``BLT_PLATFORM`` is
this framework's own knob, applied by every entrypoint (CLI, train CLI,
server) before any device work; site hooks do not know it, so it
survives. Tests use it to keep subprocess entrypoints off the real device
(a first tunnel touch costs minutes of warm-up).
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Pin the JAX backend to ``$BLT_PLATFORM`` when set (e.g. "cpu")."""
    platform = os.environ.get("BLT_PLATFORM")
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
