"""Persistent XLA compilation cache.

First-compile of the 224px train step takes minutes (remote-compile TPU
toolchains especially); the persistent cache makes every subsequent process
start near-instant. Enabled by default in all CLI entry points; opt out with
``ROVIT_KAN_NO_COMPILE_CACHE=1`` or override the location with
``ROVIT_KAN_COMPILE_CACHE_DIR``.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path.home() / ".cache" / "rovit_kan_tpu" / "xla"


def enable_compilation_cache(cache_dir=None) -> bool:
    """Idempotently enable the persistent compilation cache. Returns True
    when active."""
    if os.environ.get("ROVIT_KAN_NO_COMPILE_CACHE"):
        return False
    import jax
    cache_dir = Path(cache_dir
                     or os.environ.get("ROVIT_KAN_COMPILE_CACHE_DIR", _DEFAULT))
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
