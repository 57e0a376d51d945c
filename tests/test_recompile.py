"""Recompile bounding: a slowly translating fluid must not mint programs.

Crop windows are jit-specialization keys; they stay TIGHT (snapping them
to a coarse grid measured ~1.9x on the beam frame — swept plane area), and
_merge_windows grows a violated side one WINDOW_QUANTUM (16 cells) past
the tight bound, so steady motion costs at most a couple of recompiles —
and make_solver's LRU cap bounds the population outright.
"""

import numpy as np

import jax.numpy as jnp

from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.solver import FluidState, make_solver


def _ball_state(n, center_y, r=0.17):
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    liquid = np.sqrt((X - 0.5) ** 2 + (Y - center_y) ** 2 + (Z - 0.5) ** 2) - r
    solid = np.full_like(liquid, 1e3)
    fshapes = [tuple(n + (1 if d == a else 0) for d in range(3)) for a in range(3)]
    vel = [np.zeros(s) for s in fshapes]
    vel[1] = -0.5 * np.ones(fshapes[1])
    return FluidState(
        liquid_sdf=jnp.asarray(liquid, jnp.float32),
        solid_sdf=jnp.asarray(solid, jnp.float32),
        velocity=tuple(jnp.asarray(v, jnp.float32) for v in vel),
        solid_velocity=tuple(jnp.zeros(s, jnp.float32) for s in fshapes),
        viscosity=jnp.full(liquid.shape, 2.0, jnp.float32),
        density=jnp.ones(liquid.shape, jnp.float32),
        dx=dx,
    )


def test_translating_fluid_compiles_at_most_two_programs():
    n = 64
    cfg = SolverConfig(octree_levels=3, tolerance=1e-3, max_iterations=5)
    solve = make_solver(cfg, async_probe=False)

    # ball translating from y=0.30 to y=0.66 in 6-cell steps: the tight
    # window moves every frame, but quantization + hysteresis must keep the
    # compiled-program population at <= 2 beyond the first frame
    centers = [0.30 + 0.06 * i for i in range(7)]
    for i, cy in enumerate(centers):
        out = solve(_ball_state(n, cy), 0.01)
        assert int(out.stats.octree_dofs) > 0, i
        if i == 0:
            assert solve.cache_info()["programs"] == 1
    info = solve.cache_info()
    assert info["programs"] <= 3, info  # first + at most 2 growth recompiles


def test_draining_fluid_retightens_windows():
    """Window shrink age-out (solver.SHRINK_AFTER/_shrink_target): after a
    fluid contracts, the cached window must re-tighten within SHRINK_AFTER
    frames instead of paying the peak-occupancy sweep forever — and the
    program population must stay within the LRU cap."""
    from adaptiveviscositysolver_tpu.solver import (
        SHRINK_AFTER, _windows_volume, make_solver,
    )

    n = 64
    cfg = SolverConfig(octree_levels=3, tolerance=1e-3, max_iterations=3)
    solve = make_solver(cfg, async_probe=False)

    big = _ball_state(n, 0.5, r=0.30)
    small = _ball_state(n, 0.5, r=0.15)
    solve(big, 0.01)
    info = solve.cache_info()
    (lv_big,) = info["windows"].keys()
    vol_big = _windows_volume(info["windows"][lv_big])

    vol_seen = []
    for _ in range(SHRINK_AFTER + 2):
        out = solve(small, 0.01)
        assert int(out.stats.octree_dofs) > 0
        info = solve.cache_info()
        assert lv_big in info["windows"], (
            "fixture must keep the same trimmed level count; windows: "
            f"{info['windows'].keys()}"
        )
        vol_seen.append(_windows_volume(info["windows"][lv_big]))

    assert vol_seen[0] == vol_big, "hysteresis must hold the window at first"
    assert vol_seen[-1] < 0.7 * vol_big, (
        f"window never re-tightened: {vol_seen} vs big {vol_big}"
    )
    assert solve.cache_info()["programs"] <= 8
