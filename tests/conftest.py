"""Test harness: run everything on a virtual 8-device CPU mesh.

Tests validate numerics and sharding on CPU (fp64 available for oracle
parity); the benchmark path runs on real TPU via bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
