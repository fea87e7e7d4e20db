"""Persistent XLA compilation cache setup.

Compiles through this TPU stack take minutes; the persistent cache makes
every repeated program instant across processes. Call early (before the
first jit execution).
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    cache_dir = path or os.environ.get(
        "SCFLOW_JAX_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
