"""Test configuration: force CPU JAX with a virtual 8-device mesh.

The environment preloads jax at interpreter startup (axon sitecustomize)
with JAX_PLATFORMS=axon latched, so plain env vars set here are too late.
Backends initialize lazily, however, so jax.config.update still redirects
everything to CPU before first use. The real TPU chip is reserved for
bench.py / the driver; tests validate numerics and sharding on the
virtual CPU mesh (SURVEY.md section 7 / task environment notes).
"""
import os

# for any subprocesses the tests might spawn
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: repeated test runs skip XLA recompiles
# (first full run on the 1-core box is minutes; cached runs are seconds).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_l3c")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_l3c")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
