"""Small JAX runtime helpers shared by CLIs, codec, and bench."""
from __future__ import annotations

import os

_CACHE_DIR = os.environ.get("L3C_JAX_CACHE",
                            os.path.expanduser("~/.cache/jax_l3c"))
_done = False


def ensure_compile_cache():
    """Enable the persistent XLA compilation cache process-wide.

    First compilation of the flagship model's per-scale functions takes
    minutes on the 1-core host (and ~20-40s on TPU); with the persistent
    cache every later process (CLI invocations, bench, tests) reuses the
    compiled executables.
    """
    global _done
    if _done:
        return
    import jax
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _done = True
