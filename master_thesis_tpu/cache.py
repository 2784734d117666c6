"""Persistent XLA compilation cache.

The remote-compile path on this TPU setup costs minutes per executable;
caching compiled artifacts on disk makes repeat runs (bench, CLI restarts,
the driver's end-of-round bench) near-instant. Safe no-op if the backend
doesn't support it.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
    )
    path = os.path.abspath(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
