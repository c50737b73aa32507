"""Persistent XLA compile cache for every compiling entry point.

On this stack, compiles go through a remote-compile tunnel and take MINUTES
regardless of module size; the persistent cache makes any rerun of the same
program near-instant. bench.py has always enabled it inline — this helper
gives the training/eval CLIs and scripts the same behavior (the reference
has no analogue: torch kernels are precompiled).

Env overrides win: a caller that set JAX_COMPILATION_CACHE_DIR (or any of
the knobs) keeps their value.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/text2loc_jax_cache"


def enable_compile_cache(cache_dir: str = DEFAULT_DIR) -> None:
    """Idempotently enable the persistent compilation cache.

    Call before the first jit compilation (imports are fine — the cache is
    consulted at compile time).
    """
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # explicit env config wins
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
