"""Persistent XLA compilation cache.

Remote/tunneled TPU compiles can take minutes; caching compiled executables
on disk makes every run after the first start in milliseconds. Enabled by
every device-engine entry point; directory override via BLT_COMPILE_CACHE.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = os.environ.get(
        "BLT_COMPILE_CACHE", os.path.expanduser("~/.cache/blt_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these options
        pass
    _enabled = True
