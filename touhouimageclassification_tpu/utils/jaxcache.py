"""Persistent XLA compilation cache.

First compiles on the tunneled TPU take minutes; the persistent cache makes
every repeat run (serve CLI restarts, the eval sweep's many models, bench
re-runs) hit disk instead. Enabled by every entry point; opt out with
``TIC_COMPILE_CACHE=0``.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/tic_jax_compile")
_enabled = False


def enable_compile_cache() -> None:
    global _enabled
    if _enabled or os.environ.get("TIC_COMPILE_CACHE") == "0":
        return
    import jax

    cache_dir = os.environ.get("TIC_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
