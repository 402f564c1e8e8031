"""Persistent XLA compilation cache setup.

This jax build ignores the JAX_COMPILATION_CACHE_DIR environment variable —
the cache only engages via jax.config.update (verified: env var leaves
jax.config.jax_compilation_cache_dir = None; the config call populates the
directory, including under the axon TPU backend). First compiles of the
fold-stage programs are minutes-long (CLAUDE.md), so every CLI/bench entry
point calls this before building programs.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/trx2dy_jax_cache"


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable the on-disk XLA compile cache. Safe to call repeatedly."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # fold-stage programs are worth caching even when XLA compiles them fast
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
