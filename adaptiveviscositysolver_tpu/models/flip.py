"""Minimal grid-based liquid simulation loop around the viscosity solve.

The reference is a drop-in microsolver for Houdini's FLIP loop
(/root/reference/README.md:25-33) — the host loop advects, applies forces,
solves viscosity, then projects pressure.  This module provides a compact,
fully-jitted host loop so the framework is runnable standalone: a
semi-Lagrangian velocity/SDF advection, gravity, the adaptive viscosity
solve, and (optionally) frame snapshots.  It is a demonstration loop, not a
production FLIP solver — particle transport and pressure projection are the
caller's domain, exactly as they are Houdini's in the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..solver import FluidState, SolveResult, solve_viscosity


def _face_positions(shape, axis, dx):
    coords = []
    for d in range(3):
        c = jnp.arange(shape[d], dtype=jnp.float32)
        coords.append(c * dx if d == axis else (c + 0.5) * dx)
    return jnp.meshgrid(*coords, indexing="ij")


def _cell_positions(shape, dx):
    coords = [(jnp.arange(n, dtype=jnp.float32) + 0.5) * dx for n in shape]
    return jnp.meshgrid(*coords, indexing="ij")


def _sample_trilinear(field, pos, dx, offset):
    """Clamped trilinear sample of a staggered/cell field at world points."""
    idx = [pos[d] / dx - offset[d] for d in range(3)]
    base = [jnp.clip(jnp.floor(i), 0, field.shape[d] - 2).astype(jnp.int32)
            for d, i in enumerate(idx)]
    frac = [jnp.clip(idx[d] - base[d], 0.0, 1.0) for d in range(3)]
    out = 0.0
    for b0 in (0, 1):
        for b1 in (0, 1):
            for b2 in (0, 1):
                w = ((frac[0] if b0 else 1 - frac[0])
                     * (frac[1] if b1 else 1 - frac[1])
                     * (frac[2] if b2 else 1 - frac[2]))
                out = out + w * field[base[0] + b0, base[1] + b1, base[2] + b2]
    return out


def _velocity_at(velocity, pos, dx):
    """MAC velocity interpolated at world points (per component)."""
    comps = []
    for a in range(3):
        off = [0.5 if d != a else 0.0 for d in range(3)]
        comps.append(_sample_trilinear(velocity[a], pos, dx, off))
    return comps


def advect_state(state: FluidState, dt) -> FluidState:
    """Semi-Lagrangian advection of the SDF and MAC velocity."""
    dx = state.dx
    res = state.liquid_sdf.shape

    # advect SDF at cell centers
    pos = _cell_positions(res, dx)
    vel = _velocity_at(state.velocity, pos, dx)
    back = [pos[d] - dt * vel[d] for d in range(3)]
    new_sdf = _sample_trilinear(state.liquid_sdf, back, dx, (0.5, 0.5, 0.5))

    # advect each velocity component at its face positions
    new_vel = []
    for a in range(3):
        fpos = _face_positions(state.velocity[a].shape, a, dx)
        fvel = _velocity_at(state.velocity, fpos, dx)
        fback = [fpos[d] - dt * fvel[d] for d in range(3)]
        off = [0.5 if d != a else 0.0 for d in range(3)]
        new_vel.append(_sample_trilinear(state.velocity[a], fback, dx, off))

    return dataclasses.replace(state, liquid_sdf=new_sdf, velocity=tuple(new_vel))


def apply_gravity(state: FluidState, dt, g=-9.8) -> FluidState:
    vel = list(state.velocity)
    vel[1] = vel[1] + dt * g
    return dataclasses.replace(state, velocity=tuple(vel))


def step(state: FluidState, dt, config: SolverConfig = SolverConfig(),
         gravity: float = -9.8):
    """One frame: advect -> gravity -> viscosity solve.  Jittable."""
    state = advect_state(state, dt)
    state = apply_gravity(state, dt, gravity)
    result = solve_viscosity(state, dt, config)
    state = dataclasses.replace(state, velocity=result.velocity)
    return state, result.stats


def simulate(state: FluidState, frames: int, dt, config: SolverConfig = SolverConfig(),
             on_frame: Optional[Callable] = None):
    """Run ``frames`` steps with one compiled step function."""
    step_j = jax.jit(lambda s: step(s, dt, config))
    stats = []
    for i in range(frames):
        state, st = step_j(state)
        stats.append(st)
        if on_frame is not None:
            on_frame(i, state, st)
    return state, stats
