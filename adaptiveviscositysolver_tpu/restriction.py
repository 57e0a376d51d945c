"""Full-weighting restriction of the fine-grid velocity onto the octree.

The reference expands each octree face through a BFS queue into level-0 faces
with separable weights — 4 children x in-axis [1/16, 1/8, 1/16]
(buildVelocityMappingPartial, /root/reference/Source/HDK_AdaptiveViscosity.cpp:2291-2402).
By associativity that is the L-fold composition of one level-to-level
restriction: smooth [1/4, 1/2, 1/4] along the face axis, take even in-axis
faces, average the 2x2 transverse block.  Out-of-range fine reads are zero.

The result seeds both the CG initial guess and the rest-state RHS
``M u^n`` (cpp:424).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from .ops.arrayops import block2_sum, shift, strided_even


def restrict_face_field(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One-level full-weighting restriction of a face field."""
    smooth = 0.25 * shift(u, axis, -1) + 0.5 * u + 0.25 * shift(u, axis, 1)
    coarse = strided_even(smooth, axis)
    t_axes = [d for d in range(3) if d != axis]
    return block2_sum(coarse, t_axes) * 0.25


def restrict_velocity_pyramid(
    regular_velocity: Sequence[jnp.ndarray], levels: int
) -> Dict[Tuple[int, int], jnp.ndarray]:
    """Restricted velocity at every (level, axis) face grid.

    Level 0 is the fine field itself (the reference gathers the raw field
    even at SOLIDBOUNDARY faces, cpp:2360-2374); masking to FLUID DOFs is
    the caller's concern.
    """
    out: Dict[Tuple[int, int], jnp.ndarray] = {}
    current: List[jnp.ndarray] = list(regular_velocity)
    for level in range(levels):
        for axis in range(3):
            out[(level, axis)] = current[axis]
        if level + 1 < levels:
            current = [restrict_face_field(current[a], a) for a in range(3)]
    return out
