"""Octree label pyramid: dense TPU-native build with 2:1 face grading.

Reimplements the semantics of HDK_OctreeGrid (reference:
/root/reference/Source/HDK_OctreeGrid.{h,cpp}) as whole-array ops over a
level-major pyramid of dense int8 label grids.

Labels (HDK_OctreeGrid.h:33-39):
  INACTIVE — finest-level cell outside the region of interest (and coarse
             cells with no labelled descendants)
  ACTIVE   — leaf cell of the conceptual octree
  UP       — descendant of a leaf (kept so fine-grid queries can climb)
  DOWN     — ancestor of a leaf (internal node)

The reference builds the pyramid bottom-up with three passes per level
(HDK_OctreeGrid.cpp:93-189), using thread-local deferred parent writes purely
to cope with tile compression.  On TPU each pass is a handful of masked
shifts / 2x2x2 reductions; the deferred-write machinery has no analog.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .ops.arrayops import down_reduce_cells, shift, upread

INACTIVE = 0
ACTIVE = 1
UP = 2
DOWN = 3

LABEL_DTYPE = jnp.int8


def mask_to_base_labels(mask: jnp.ndarray) -> jnp.ndarray:
    """Ternary refinement mask -> level-0 labels (HDK_OctreeGrid.cpp:310-392).

    mask > 0 -> INACTIVE, mask == 0 -> ACTIVE, mask < 0 -> UP.
    """
    return jnp.where(
        mask == 0, jnp.int8(ACTIVE), jnp.where(mask < 0, jnp.int8(UP), jnp.int8(INACTIVE))
    ).astype(LABEL_DTYPE)


def build_octree(mask: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Build the graded label pyramid (HDK_OctreeGrid::init, cpp:4-243).

    ``mask`` must have power-of-two-divisible extents for ``levels`` levels
    (callers pad with +1/INACTIVE like the reference pads to powers of two).
    Returns ``levels`` dense label arrays, finest first.  The reference trims
    trailing levels with no ACTIVE cells (cpp:198-211); we keep a static level
    count — empty levels simply produce no DOFs downstream.
    """
    res = mask.shape
    for n in res:
        if n % (1 << (levels - 1)) != 0:
            raise ValueError(
                f"resolution {res} not divisible by 2^{levels - 1}; pad the domain first"
            )

    labels: List[jnp.ndarray] = [mask_to_base_labels(mask)]
    for level in range(1, levels):
        shape = tuple(n >> level for n in res)
        labels.append(jnp.full(shape, INACTIVE, LABEL_DTYPE))

    for level in range(levels - 1):
        lab = labels[level]
        parent = labels[level + 1]

        # Pass 1 (cpp:395-565): an UP cell with an ACTIVE sibling becomes
        # ACTIVE; parents of ACTIVE cells become DOWN.
        group_has_active = down_reduce_cells(lab == ACTIVE, "any")
        lab = jnp.where(
            (lab == UP) & upread(group_has_active, lab.shape), jnp.int8(ACTIVE), lab
        )
        parent = jnp.where(down_reduce_cells(lab == ACTIVE, "any"), jnp.int8(DOWN), parent)

        # Pass 2 — face grading (cpp:656-754): an UP cell face-adjacent to an
        # ACTIVE cell forces its parent ACTIVE; a DOWN cell forces its parent
        # DOWN.  The two parent sets are disjoint by construction (a sibling
        # group never mixes UP and DOWN: cpp:730-736).
        is_active = lab == ACTIVE
        up_near_active = jnp.zeros(lab.shape, bool)
        for axis in range(3):
            for offset in (-1, 1):
                up_near_active |= (lab == UP) & shift(is_active, axis, offset, fill=False)
        parent = jnp.where(down_reduce_cells(lab == DOWN, "any"), jnp.int8(DOWN), parent)
        parent = jnp.where(down_reduce_cells(up_near_active, "any"), jnp.int8(ACTIVE), parent)

        # Pass 3 (cpp:756-840): UP cells pass UP to a still-INACTIVE parent.
        parent = jnp.where(
            (parent == INACTIVE) & down_reduce_cells(lab == UP, "any"), jnp.int8(UP), parent
        )

        labels[level] = lab
        labels[level + 1] = parent

    # Top level clean-up (cpp:843-875): any remaining UP becomes ACTIVE.
    labels[-1] = jnp.where(labels[-1] == UP, jnp.int8(ACTIVE), labels[-1])
    return labels


def refine_grid(labels: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Double the resolution of every level (HDK_OctreeGrid::refineGrid,
    cpp:1306-1362): each new cell copies its parent's label from the old grid
    at the same level."""
    out = []
    for lab in labels:
        new_shape = tuple(2 * n for n in lab.shape)
        out.append(upread(lab, new_shape))
    return out


def active_cell_counts(labels: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Number of ACTIVE cells per level (for reports / level trimming)."""
    return jnp.stack([jnp.sum(lab == ACTIVE) for lab in labels])


def occupied_bboxes(labels: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Per level, the cell-index bounding box of the occupied (non-INACTIVE)
    region as a (3, 2) array of [lo, hi) per axis; (0, 0) rows when empty.

    Every velocity/stress DOF and every nonzero stencil input lives on the
    faces/edges of ACTIVE or UP cells, all of which are non-INACTIVE, so
    arrays cropped to this box (plus a small margin for neighbor kind reads)
    carry the complete system — the host-side probe feeds it to the Pallas
    operator as a static shape so the kernels skip the empty space that
    dense full-domain canonical boxes would sweep."""
    out = []
    for lab in labels:
        present = lab != INACTIVE
        rows = []
        for d in range(3):
            axes = tuple(a for a in range(3) if a != d)
            line = jnp.any(present, axis=axes)
            n = line.shape[0]
            idx = jnp.arange(n)
            lo = jnp.min(jnp.where(line, idx, n))
            hi = jnp.max(jnp.where(line, idx, -1)) + 1
            empty = ~jnp.any(line)
            rows.append(jnp.stack([jnp.where(empty, 0, lo),
                                   jnp.where(empty, 0, hi)]))
        out.append(jnp.stack(rows))
    return out


def octree_geometry(labels: Sequence[jnp.ndarray], dx: float, origin=(0.0, 0.0, 0.0)):
    """Debug export of ACTIVE cell centers with per-point scale and level —
    the parity analog of outputOctreeGeometry (HDK_OctreeGrid.cpp:245-308).

    Host-side helper (returns numpy arrays): positions (N,3), pscale (N,),
    level (N,).
    """
    import numpy as np

    positions, pscales, levs = [], [], []
    for level, lab in enumerate(labels):
        lab = np.asarray(lab)
        level_dx = dx * (1 << level)
        idx = np.argwhere(lab == ACTIVE)
        if idx.size == 0:
            continue
        positions.append((idx + 0.5) * level_dx + np.asarray(origin))
        pscales.append(np.full(len(idx), level_dx))
        levs.append(np.full(len(idx), level, np.int32))
    if not positions:
        return np.zeros((0, 3)), np.zeros(0), np.zeros(0, np.int32)
    return np.concatenate(positions), np.concatenate(pscales), np.concatenate(levs)


def build_refinement_mask(
    liquid_sdf: jnp.ndarray,
    solid_sdf: jnp.ndarray,
    dx: float,
    extrapolation: float,
    outer_band: float,
    inner_band: float,
) -> jnp.ndarray:
    """Ternary octree refinement mask from the liquid/solid SDFs
    (HDK_AdaptiveViscosity::buildOctree mask functor, cpp:815-870).

    Fine (0) band: 0 < sdf < outer_band, or -inner_band < sdf <= 0, or deep
    inside the liquid but near the solid.  Deep interior -> -1 (UP); far
    outside -> +1 (INACTIVE).

    Sign convention: this library uses standard SDFs for *both* fields
    (negative inside the liquid / inside the solid).  The reference's
    ``collision`` field is positive inside the solid (see the comparisons at
    cpp:853 and cpp:1157), so its ``solid > -inner-extrap -> stay fine``
    becomes ``solid < inner+extrap`` here.
    """
    sdf = liquid_sdf
    deep_inside = (sdf <= -inner_band) & (solid_sdf >= (inner_band + extrapolation))
    outside = sdf >= outer_band
    return jnp.where(outside, jnp.int8(1), jnp.where(deep_inside, jnp.int8(-1), jnp.int8(0)))
