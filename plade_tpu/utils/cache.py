"""Persistent XLA compile cache setup.

The full-pipeline programs are large and this environment's compile service
has high latency variance (the same small program has been observed to
compile in 2 s and 270 s).  Caching everything aggressively makes reruns
and benchmark rounds cheap.  Call once at process start.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    path = path or os.environ.get("PLADE_COMPILE_CACHE", DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
