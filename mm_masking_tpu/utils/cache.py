"""Persistent XLA compilation cache helper.

Full-size programs take minutes to compile on this single-core host; the
persistent cache makes repeat runs (bench, CLI, driver checks) near-instant.
NB: the ``JAX_COMPILATION_CACHE_DIR`` env var is ignored in this image (the
axon plugin initializes config first); only explicit ``jax.config.update``
calls take effect — call this right after importing jax, before first use.
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
