"""Write the octree solution back onto the uniform grid.

applyVelocitiesToRegularGridPartial (/root/reference/Source/
HDK_AdaptiveViscosity.cpp:2815-2894): per regular-grid FLUID face, copy the
matching level-0 octree DOF; SOLIDBOUNDARY octree faces take the solid
velocity; UNASSIGNED octree faces (interior coarsened regions) take the
T-junction interpolated value; regular SOLIDBOUNDARY faces also take the
solid velocity; untouched faces keep the input velocity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from . import classify


def apply_to_regular_grid(
    velocity: Sequence[jnp.ndarray],
    solution: Dict[Tuple[int, int], jnp.ndarray],
    labels,
    vel_kinds,
    regular_kinds: Sequence[jnp.ndarray],
    solid_velocity: Sequence[jnp.ndarray],
    levels: int,
    interpolated: Optional[Sequence[jnp.ndarray]] = None,
) -> List[jnp.ndarray]:
    """Returns the three updated face-velocity arrays.

    ``interpolated``: per-axis level-0 face arrays holding the T-junction
    interpolator's value at every face (only consulted where the octree face
    is UNASSIGNED).  When ``None`` those faces keep the input velocity
    (used before the interpolator stage exists in a pipeline, and by tests).
    """
    out = []
    for a in range(3):
        u = velocity[a]
        okind = vel_kinds[0][a]
        rkind = regular_kinds[a]
        regular_fluid = rkind == classify.FLUID

        v = u.astype(solution[(0, a)].dtype)
        v = jnp.where(regular_fluid & (okind == classify.FLUID), solution[(0, a)], v)
        v = jnp.where(
            regular_fluid & (okind == classify.SOLIDBOUNDARY), solid_velocity[a], v
        )
        if interpolated is not None:
            v = jnp.where(
                regular_fluid & (okind == classify.UNASSIGNED), interpolated[a], v
            )
        v = jnp.where(rkind == classify.SOLIDBOUNDARY, solid_velocity[a], v)
        out.append(v.astype(u.dtype))
    return out
