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
    """Enable the on-disk XLA compile cache. Safe to call repeatedly.

    Without an explicit path, an already-configured cache dir is KEPT:
    CLI mains call this on entry, and when tests drive those mains
    in-process a silent dir switch would split the cache across
    directories (every later program recompiles — and heavy recompiles
    are what trigger this jaxlib's flaky compiler segfaults)."""
    import jax

    if path is None:
        current = jax.config.jax_compilation_cache_dir
        if current:
            return current
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Persist EVERYTHING (min compile time 0): compiling is what burns
    # this jaxlib's per-process memory-map budget (each XLA:CPU
    # executable adds thousands of mappings; crossing vm.max_map_count
    # segfaults — see tests/conftest.py), and first compiles of fold
    # programs are minutes-long on this host. A fully-warm cache makes
    # reruns near-compile-free. Tiny cache files are cheap; /tmp is
    # disposable.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
