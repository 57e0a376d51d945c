"""DOF classification for velocities and stresses on the octree pyramid.

Dense reimplementation of the reference's label passes
(/root/reference/Source/HDK_AdaptiveViscosity.cpp:1087-1443) and the serial
index sweeps (cpp:1445-1715).  Every grid point gets a *kind*:

  FLUID (0)          — an unknown; receives a DOF index >= 0 in the sweep
  UNASSIGNED (-1)    — untouched (covered by another level, or irrelevant)
  SOLIDBOUNDARY (-2) — velocity pinned to the solid velocity (ghost value)
  OUTSIDE (-3)       — outside the liquid / domain

matching the sentinel scheme of HDK_Utilities.h:18-21.  Kinds are int8 grid
arrays; DOF indices (int32, level-major then axis-major, C-order within each
grid) are derived by exclusive cumsum and only needed for reporting and
oracle tests — the matrix-free operator consumes the kind masks directly.

Solid SDF is negative inside the solid (see fields.py note on the
reference's inverted convention).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from . import octree
from .fields import cell_to_face_avg
from .ops.arrayops import edge_shape, face_shape, grow

FLUID = 0
UNASSIGNED = -1
SOLIDBOUNDARY = -2
OUTSIDE = -3

KIND_DTYPE = jnp.int8

ACTIVE = octree.ACTIVE
INACTIVE = octree.INACTIVE
UP = octree.UP
DOWN = octree.DOWN


def _face_cell_labels(labels: jnp.ndarray, axis: int):
    """Per-face (backward, forward) cell labels + an out-of-bounds mask.

    Face i along ``axis`` has backward cell i-1 and forward cell i; faces at
    i=0 and i=n have one cell out of bounds.  OOB positions carry INACTIVE in
    the label arrays; use the mask for bounds semantics.
    """
    n = labels.shape[axis]
    back = grow(labels, axis, lo=1, fill=INACTIVE)  # shape +1; back[i] = lab[i-1]
    fwd = grow(labels, axis, hi=1, fill=INACTIVE)
    idx = jnp.arange(n + 1)
    shape = [1, 1, 1]
    shape[axis] = n + 1
    idx = idx.reshape(shape)
    oob = (idx == 0) | (idx == n)
    oob = jnp.broadcast_to(oob, face_shape(labels.shape, axis))
    return back, fwd, oob


def _face_weight_activity(center_w: jnp.ndarray, edge_w: Sequence[jnp.ndarray], axis: int):
    """A face is near the surface iff either adjacent cell-center weight or
    any of its 4 surrounding edge weights is positive (cpp:1127-1150)."""
    back_w = grow(center_w, axis, lo=1, fill=0.0)
    fwd_w = grow(center_w, axis, hi=1, fill=0.0)
    act = (back_w > 0) | (fwd_w > 0)
    for edge_axis in range(3):
        if edge_axis == axis:
            continue
        offset_axis = 3 - axis - edge_axis
        ew = edge_w[edge_axis]  # shape: +1 along axis and offset_axis
        # face -> edge: direction 0 at the face index, direction 1 offset +1
        # along offset_axis.  Build a face-shaped read of the edge grid: the
        # edge grid already has +1 along both (axis, offset_axis); the face
        # grid has +1 along axis only, so crop offset_axis.
        n_off = ew.shape[offset_axis]
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[offset_axis] = slice(0, n_off - 1)
        hi[offset_axis] = slice(1, n_off)
        act = act | (ew[tuple(lo)] > 0) | (ew[tuple(hi)] > 0)
    return act


def classify_regular_velocity(
    center_w: jnp.ndarray,
    edge_w: Sequence[jnp.ndarray],
    solid_sdf: jnp.ndarray,
    extrapolation: float,
    axis: int,
) -> jnp.ndarray:
    """Uniform-grid face classification (classifyRegularVelocityFaces,
    cpp:1087-1165)."""
    res = center_w.shape
    _, _, oob = _face_cell_labels(jnp.zeros(res, KIND_DTYPE), axis)
    active = _face_weight_activity(center_w, edge_w, axis)
    solid_at_face = cell_to_face_avg(solid_sdf, axis)
    in_solid = solid_at_face < extrapolation  # reference: solid_ref > -extrap
    kind = jnp.where(
        (~oob) & active,
        jnp.where(in_solid, jnp.int8(SOLIDBOUNDARY), jnp.int8(FLUID)),
        jnp.int8(UNASSIGNED),
    )
    return kind.astype(KIND_DTYPE)


def classify_octree_velocity(
    labels: Sequence[jnp.ndarray],
    center_w: jnp.ndarray,
    edge_w: Sequence[jnp.ndarray],
    solid_sdf: jnp.ndarray,
    extrapolation: float,
) -> List[List[jnp.ndarray]]:
    """Octree face classification per level/axis (classifyOctreeVelocityFaces,
    cpp:1167-1323)."""
    kinds: List[List[jnp.ndarray]] = []
    for level, lab in enumerate(labels):
        per_axis = []
        for axis in range(3):
            back, fwd, oob = _face_cell_labels(lab, axis)
            both_active = (back == ACTIVE) & (fwd == ACTIVE)
            any_inactive = (back == INACTIVE) | (fwd == INACTIVE)
            act_up = ((back == UP) & (fwd == ACTIVE)) | ((back == ACTIVE) & (fwd == UP))
            if level == 0:
                active = _face_weight_activity(center_w, edge_w, axis)
                solid_at_face = cell_to_face_avg(solid_sdf, axis)
                in_solid = solid_at_face < extrapolation
                surface_kind = jnp.where(
                    active,
                    jnp.where(in_solid, jnp.int8(SOLIDBOUNDARY), jnp.int8(FLUID)),
                    jnp.int8(OUTSIDE),
                )
                kind = jnp.where(
                    oob,
                    jnp.int8(OUTSIDE),
                    jnp.where(
                        both_active,
                        surface_kind,
                        jnp.where(
                            any_inactive,
                            jnp.int8(OUTSIDE),
                            jnp.where(act_up, jnp.int8(FLUID), jnp.int8(UNASSIGNED)),
                        ),
                    ),
                )
            else:
                kind = jnp.where(
                    (~oob) & (both_active | act_up), jnp.int8(FLUID), jnp.int8(UNASSIGNED)
                )
            per_axis.append(kind.astype(KIND_DTYPE))
        kinds.append(per_axis)
    return kinds


def classify_edge_stress(
    labels: Sequence[jnp.ndarray],
    edge_w: Sequence[jnp.ndarray],
) -> List[List[jnp.ndarray]]:
    """Edge (shear) stress classification (classifyEdgeStresses, cpp:1325-1405).

    The reference walks the edge's 4 surrounding cells in cellIndex order with
    early exits: an out-of-bounds cell marks the edge OUTSIDE, a DOWN cell
    leaves it UNASSIGNED — whichever comes *first* in the scan wins.  We fold
    the four steps as a tiny state machine over dense masks.
    """
    kinds: List[List[jnp.ndarray]] = []
    for level, lab in enumerate(labels):
        res = lab.shape
        per_axis = []
        for axis in range(3):
            eshape = edge_shape(res, axis)
            t1, t2 = (axis + 1) % 3, (axis + 2) % 3
            # status codes: 0 = pending, 1 = outside, 2 = unassigned(DOWN)
            status = jnp.zeros(eshape, jnp.int8)
            any_active = jnp.zeros(eshape, bool)
            for cell_index in range(4):
                # cell = edge - (1 - bit)*e_t for each transverse axis
                d1 = 0 if (cell_index & 1) else -1
                d2 = 0 if (cell_index & 2) else -1
                cl = lab
                ob = jnp.zeros(eshape, bool)
                # read lab at (edge + d1*e_t1 + d2*e_t2) onto the edge grid
                arr = lab
                for t, d in ((t1, d1), (t2, d2)):
                    # edge grid has +1 along t; cell index = edge index + d
                    if d == 0:
                        arr = grow(arr, t, hi=1, fill=INACTIVE)
                    else:
                        arr = grow(arr, t, lo=1, fill=INACTIVE)
                cl = arr
                idx1 = jnp.arange(eshape[t1]).reshape(
                    [eshape[t1] if d == t1 else 1 for d in range(3)]
                )
                idx2 = jnp.arange(eshape[t2]).reshape(
                    [eshape[t2] if d == t2 else 1 for d in range(3)]
                )
                ob = ob | jnp.broadcast_to(
                    (idx1 + d1 < 0) | (idx1 + d1 >= res[t1]), eshape
                )
                ob = ob | jnp.broadcast_to(
                    (idx2 + d2 < 0) | (idx2 + d2 >= res[t2]), eshape
                )
                pending = status == 0
                status = jnp.where(pending & ob, jnp.int8(1), status)
                pending = status == 0
                status = jnp.where(pending & (cl == DOWN), jnp.int8(2), status)
                pending = status == 0
                any_active = any_active | (pending & (cl == ACTIVE))
            if level == 0:
                fluid_kind = jnp.where(
                    edge_w[axis] > 0, jnp.int8(FLUID), jnp.int8(OUTSIDE)
                )
            else:
                fluid_kind = jnp.int8(FLUID)
            kind = jnp.where(
                status == 1,
                jnp.int8(OUTSIDE),
                jnp.where(
                    (status == 0) & any_active, fluid_kind, jnp.int8(UNASSIGNED)
                ),
            )
            per_axis.append(kind.astype(KIND_DTYPE))
        kinds.append(per_axis)
    return kinds


def classify_center_stress(
    labels: Sequence[jnp.ndarray],
    center_w: jnp.ndarray,
) -> List[jnp.ndarray]:
    """Normal-stress classification: one DOF per ACTIVE cell; level 0 also
    requires a positive center weight (classifyCenterStresses, cpp:1407-1443)."""
    kinds = []
    for level, lab in enumerate(labels):
        active = lab == ACTIVE
        if level == 0:
            active = active & (center_w > 0)
        kinds.append(
            jnp.where(active, jnp.int8(FLUID), jnp.int8(UNASSIGNED)).astype(KIND_DTYPE)
        )
    return kinds


def assign_indices(kind_grids: Sequence[jnp.ndarray]) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Exclusive-cumsum DOF indexing across an ordered list of kind grids.

    Returns int32 index grids (FLUID entries numbered consecutively in
    C-order, others keep their sentinel) and the total DOF count.  Ordering
    parity note: the reference numbers DOFs in voxel-tile order
    (cpp:1484-1509); any fixed permutation yields the same solve, so we use
    flat C-order.
    """
    flats = [(k == FLUID).reshape(-1) for k in kind_grids]
    counts = [f.sum() for f in flats]
    offsets = jnp.cumsum(jnp.stack([jnp.zeros((), counts[0].dtype)] + counts[:-1]))
    out = []
    for k, f, off in zip(kind_grids, flats, offsets):
        idx = jnp.cumsum(f) - 1 + off
        grid = jnp.where(k == FLUID, idx.reshape(k.shape).astype(jnp.int32), k.astype(jnp.int32))
        out.append(grid)
    total = sum(counts)
    return out, total
