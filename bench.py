"""Benchmark: per-frame adaptive viscosity solve wall-clock on the live chip.

Prints ONE JSON line: the viscousBuckling-analog per-frame solve time at
64^3 with 4 octree levels (the reference's headline workload; BASELINE.md).
``vs_baseline`` is the speedup over running the identical jitted pipeline on
the host CPU (the reference itself is a CPU-only Houdini plugin with no
published numbers, so the measured CPU run of the same solve stands in as
the baseline hardware).
"""

import json
import time

import jax
import jax.numpy as jnp


def time_solve(platform: str, n=64, repeats=3):
    devices = [d for d in jax.devices(platform)]
    device = devices[0]
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig
    from adaptiveviscositysolver_tpu.solver import solve_viscosity

    config = SolverConfig(octree_levels=4, tolerance=1e-4)
    state = scenes.buckling(n=n)
    state = jax.device_put(state, device)
    dt = jnp.float32(1.0 / 24.0)

    solve = jax.jit(lambda s, t: solve_viscosity(s, t, config))
    out = solve(state, dt)
    jax.block_until_ready(out)  # compile + warm-up

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = solve(state, dt)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    tpu_ms, out = time_solve("tpu" if any(
        d.platform == "tpu" for d in jax.devices()) else None)
    try:
        cpu_ms, _ = time_solve("cpu")
    except Exception:
        cpu_ms = float("nan")
    print(json.dumps({
        "metric": "buckling_64_solve_wallclock",
        "value": round(tpu_ms, 2),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / tpu_ms, 2) if cpu_ms == cpu_ms else None,
        "cg_iterations": int(out.stats.iterations),
        "residual": float(out.stats.residual),
        "octree_dofs": int(out.stats.octree_dofs),
        "regular_dofs": int(out.stats.regular_dofs),
    }))


if __name__ == "__main__":
    main()
