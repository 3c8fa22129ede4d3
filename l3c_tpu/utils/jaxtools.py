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


def maybe_profile(out_dir_env: str = "L3C_PROFILE"):
    """Context manager: jax.profiler trace if $L3C_PROFILE is set.

    Device-side analogue of the reference's StackTimeLogger wall-clock
    scopes (SURVEY.md section 5): L3C_PROFILE=/tmp/trace python bench.py
    writes a TensorBoard-loadable trace of every kernel and transfer.
    """
    import contextlib
    out = os.environ.get(out_dir_env)
    if not out:
        return contextlib.nullcontext()
    import jax
    return jax.profiler.trace(out, create_perfetto_link=False)
