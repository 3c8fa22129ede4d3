"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Must run before any `import jax` in test modules. The real TPU chip is
reserved for bench.py / the driver; tests validate numerics and sharding
on a virtual CPU mesh (SURVEY.md section 7 / task environment notes).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
