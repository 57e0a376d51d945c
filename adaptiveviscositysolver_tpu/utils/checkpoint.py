"""Checkpoint / resume helpers for simulation-loop state.

The solver itself is stateless per frame — like the reference, where
Houdini owns all simulation state between solves (SURVEY.md §5).  Loop
state is a single :class:`~adaptiveviscositysolver_tpu.solver.FluidState`;
these helpers snapshot it to a portable .npz (host-sized states; for
multi-host sharded states swap in an orbax CheckpointManager at the call
site — the pytree is orbax-compatible).
"""

from __future__ import annotations

import os

import numpy as np

from ..solver import FluidState

_FIELDS = ["liquid_sdf", "solid_sdf", "viscosity", "density"]


def _path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save(path: str, state: FluidState, step: int = 0) -> None:
    data = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    for a in range(3):
        data[f"velocity_{a}"] = np.asarray(state.velocity[a])
        data[f"solid_velocity_{a}"] = np.asarray(state.solid_velocity[a])
    np.savez(_path(path), dx=state.dx, step=step, **data)


def load(path: str):
    """Returns (FluidState, step)."""
    import jax.numpy as jnp

    z = np.load(_path(path))
    state = FluidState(
        liquid_sdf=jnp.asarray(z["liquid_sdf"]),
        solid_sdf=jnp.asarray(z["solid_sdf"]),
        velocity=tuple(jnp.asarray(z[f"velocity_{a}"]) for a in range(3)),
        solid_velocity=tuple(
            jnp.asarray(z[f"solid_velocity_{a}"]) for a in range(3)
        ),
        viscosity=jnp.asarray(z["viscosity"]),
        density=jnp.asarray(z["density"]),
        dx=float(z["dx"]),
    )
    return state, int(z["step"])
