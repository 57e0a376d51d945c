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

# Persistent compilation cache (local, gitignored): on this 1-core host a single
# end-to-end jit compile costs 2-6 minutes and dominates every test; the
# cache entries are deterministic for a given jaxlib + flags, so re-runs of
# an unchanged tree (the smoke tier especially) skip the compiles entirely.
# A code change just misses and recompiles.  Override with
# JAX_COMPILATION_CACHE_DIR or disable with AVS_TEST_NO_CACHE=1.
if os.environ.get("AVS_TEST_NO_CACHE", "") != "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the local CPU backend; got " + str(jax.devices()[:2])
)
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
