"""Run any l3c_tpu CLI on the host CPU backend.

The environment preloads jax with JAX_PLATFORMS=axon latched
(sitecustomize), so env vars alone cannot redirect a CLI to CPU; the
backend must be re-pointed via jax.config BEFORE first use (same trick
as tests/conftest.py). This wrapper does that, then dispatches:

    python -m tools.cpu_run [--devices N] MODULE [ARGS...]

e.g.
    python -m tools.cpu_run l3c_tpu.cli.test models_zoo 0819_0307 \
        demo_data/real/val --compare_theory --write_to_files /tmp/out

Useful when the shared-chip tunnel is down or busy (training runs own
the chip): the v8 coding CDF is exact-integer and platform-independent,
so CPU-evaluated bpsp/actual-file numbers are the same contract as
on-chip ones (RESULTS.md round 3, cross-platform round-trip test).
"""
from __future__ import annotations

import importlib
import os
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    n_dev = 1
    if argv and argv[0] == "--devices":
        n_dev = int(argv[1])
        argv = argv[2:]
    if not argv:
        print(__doc__)
        return 2
    module, args = argv[0], argv[1:]

    os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_l3c")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_l3c")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    mod = importlib.import_module(module)
    return mod.main(args)


if __name__ == "__main__":
    sys.exit(main())
