"""Multi-chip SPMD: the full solve must compile and run on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import scenes
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_solver,
    shard_state,
)
from adaptiveviscositysolver_tpu.solver import solve_viscosity


@pytest.mark.sharded
def test_sharded_solve_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = SolverConfig(octree_levels=2, max_iterations=50, tolerance=1e-6)
    state = scenes.buckling(n=32, dtype=jnp.float64)
    dt = 1.0 / 24.0

    single = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, dt)

    mesh = make_mesh(8)
    sharded_state = shard_state(state, mesh)
    solve = make_sharded_solver(mesh, cfg)
    sharded = solve(sharded_state, dt)
    jax.block_until_ready(sharded)

    assert int(sharded.stats.octree_dofs) == int(single.stats.octree_dofs)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(sharded.velocity[a]), np.asarray(single.velocity[a]),
            rtol=1e-8, atol=1e-10,
        )
    # outputs must actually be distributed across the mesh: the velocity
    # grids are sharded spatially, so a 1D mesh of 8 must yield 8 distinct
    # shard devices (a fully-replicated result would collapse to fewer).
    shard_devices = {
        s.device for s in sharded.velocity[0].addressable_shards
    }
    assert len(shard_devices) == 8, shard_devices


@pytest.mark.sharded
def test_sharded_pallas_solve_matches_single_device():
    """The TPU fast path, distributed: apply_impl='pallas' on an 8-device
    mesh routes the CG through shard_map (ppermute halo exchange + psum
    dots, parallel/shard_pallas.py) running the fused Pallas kernels in
    interpret mode on each device's local canonical boxes.

    Realistic shape: 24^3 at 3 levels — nx=24 does NOT admit the 1D
    decomposition on 8 devices (mesh_n << (levels-1) = 32 does not divide
    24), so the solve must auto-pad x to 32 (solver.padded_shape with
    mesh_n=8) and still take the shard_map path, reported via
    stats.solve_path.  (48^3 exercises the same code paths but runs >80
    CPU-minutes in interpret mode on this 1-core host.)

    Bounded runtime: both solves run a FIXED 4 CG iterations (tolerance
    pinned unreachably low) so the sharded and single-device iterates are
    the same algebra evaluated under different reduction orders — equal to
    fp32 roundoff — without paying interpret-mode convergence costs."""
    assert len(jax.devices()) >= 8
    K = 4
    cfg = SolverConfig(octree_levels=3, max_iterations=K, tolerance=1e-30,
                       apply_impl="pallas", dtype=jnp.float32)
    state = scenes.buckling(n=24, dtype=jnp.float32)
    dt = 1.0 / 24.0

    single = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, dt)
    assert single.stats.solve_path == "pallas"

    mesh = make_mesh(8)
    sharded_state = shard_state(state, mesh)
    solve = make_sharded_solver(mesh, cfg)
    sharded = solve(sharded_state, dt)
    jax.block_until_ready(sharded)

    assert sharded.stats.solve_path == "pallas-sharded"
    assert int(sharded.stats.iterations) == K
    assert int(sharded.stats.iterations) == int(single.stats.iterations)
    assert int(sharded.stats.octree_dofs) == int(single.stats.octree_dofs)
    scale = max(float(jnp.max(jnp.abs(single.velocity[a]))) for a in range(3))
    for a in range(3):
        diff = float(jnp.max(jnp.abs(sharded.velocity[a] - single.velocity[a])))
        assert diff / scale < 1e-5, (a, diff, scale)
    shard_devices = {
        s.device for s in sharded.velocity[0].addressable_shards
    }
    assert len(shard_devices) == 8, shard_devices
