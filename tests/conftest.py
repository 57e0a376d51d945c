"""Test harness: run everything on a virtual 8-device CPU mesh with fp64.

The container's interpreter environment force-registers a remote TPU backend
for every Python process (sitecustomize on PYTHONPATH), which would route
test compiles and *every eager op* through the device tunnel.  Tests want the
local CPU backend: fast local compiles, native float64 for oracle parity, and
8 virtual devices for the sharding tests.  The backend registration already
happened by the time this file runs, but the platform *selection* and the
CPU client's device count can still be overridden in-process as long as no
jax computation has executed yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the local CPU backend; got " + str(jax.devices()[:2])
)
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
