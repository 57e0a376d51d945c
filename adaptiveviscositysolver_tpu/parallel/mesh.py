"""Multi-chip SPMD scale-out for the viscosity solve.

The reference's only parallelism is shared-memory fork-join over voxel tiles
(/root/reference/Source/HDK_OctreeGrid.h:207-321 and 39 THREADED_METHOD uses)
plus OpenMP inside Eigen's CG.  The TPU-native scale-out axis is spatial SPMD:
shard every finest-level array along the leading spatial axis over a 1D
``jax.sharding.Mesh``; XLA's SPMD partitioner turns the stencil shifts into
halo exchanges (collective-permute over ICI) and the CG dot products into
``psum`` all-reduces.  Coarse pyramid levels are geometrically small (1/8 per
level) and may be replicated or resharded by the partitioner as it sees fit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..solver import FluidState, solve_viscosity


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _face_spec(mesh: Mesh, face_axis: int, axis_name: str):
    """INPUT sharding for staggered (+1) face grids: their leading extent
    ``n+1`` is indivisible by the mesh, and JAX rejects uneven shardings at
    every API boundary (``device_put`` and ``jit`` in/out shardings both
    validate divisibility — GSPMD's internal padded uneven layouts are not
    expressible there).  So staggered inputs arrive split along their
    first non-staggered dim; this only seeds GSPMD's propagation — the
    partitioner re-lays-out the interior as it sees fit, and the explicit
    shard_map fast path re-blocks every array itself (block_x,
    parallel/shard_pallas.py), so the boundary spec costs one input
    reshard at most."""
    dims = [None, None, None]
    dims[1 if face_axis == 0 else 0] = axis_name
    return NamedSharding(mesh, P(*dims))


def state_sharding(mesh: Mesh, axis_name: str = "x"):
    """Sharding pytree for a FluidState: all grids split on the leading
    spatial dim."""
    cell = NamedSharding(mesh, P(axis_name, None, None))
    face = tuple(_face_spec(mesh, a, axis_name) for a in range(3))
    return FluidState(
        liquid_sdf=cell,
        solid_sdf=cell,
        velocity=face,
        solid_velocity=face,
        viscosity=cell,
        density=cell,
        dx=None,
    )


def shard_state(state: FluidState, mesh: Mesh, axis_name: str = "x") -> FluidState:
    spec = state_sharding(mesh, axis_name)
    return FluidState(
        liquid_sdf=jax.device_put(state.liquid_sdf, spec.liquid_sdf),
        solid_sdf=jax.device_put(state.solid_sdf, spec.solid_sdf),
        velocity=tuple(
            jax.device_put(v, s) for v, s in zip(state.velocity, spec.velocity)
        ),
        solid_velocity=tuple(
            jax.device_put(v, s) for v, s in zip(state.solid_velocity, spec.solid_velocity)
        ),
        viscosity=jax.device_put(state.viscosity, spec.viscosity),
        density=jax.device_put(state.density, spec.density),
        dx=state.dx,
    )


def make_sharded_solver(mesh: Mesh, config: SolverConfig = SolverConfig(),
                        axis_name: str = "x"):
    """Jitted multi-chip solve with spatially-sharded inputs.

    Build/classify/stencil/writeback stages are whole-array ops — GSPMD
    inserts their halo exchanges and reductions automatically.  The CG
    stage is mesh-aware (solver.py): with ``apply_impl`` "pallas"/"auto"
    it runs the fused Pallas matvec under an explicit ``shard_map``
    (ppermute halos + psum dots, parallel/shard_pallas.py), since a
    manual-DMA ``pallas_call`` is not GSPMD-partitionable; otherwise (or
    when the grid doesn't admit the 1D decomposition) it uses the
    GSPMD-shardable whole-array operator."""

    def solve(state: FluidState, dt):
        return solve_viscosity(state, dt, config, mesh=mesh,
                               mesh_axis=axis_name)

    return jax.jit(solve)
