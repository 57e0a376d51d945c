"""Variational stress stencils as dense per-level term bundles.

The reference precomputes, per stress DOF, an explicit list of
``StressStencilFace{index, coeff}`` entries — the row of the velocity->stress
gradient operator D — and then assembles a sparse matrix from
``coeff * D_row^T D_row`` outer products
(/root/reference/Source/HDK_AdaptiveViscosity.cpp:1717-2289).

Here the same rows are represented *densely*: each stress grid (edge stresses
per level/axis, center stresses per level) carries a small list of
:class:`StressTerm`'s — (lift, shift, coefficient-array) triples — such that

    tau = sum_t  coeff_t  *  gather(lift_t(u), offset_t)

reproduces D row-for-row.  Because every term reads *distinct* velocity DOFs
within one stress row (verified against the oracle), the same term list also
yields D^T (via each term's adjoint) and the Jacobi diagonal (adjoint of
``w * coeff^2``) — one declarative spec, three operators.  The system is then
matrix-free SPD by construction:

    A u = M u + D^T W D u,   the reference's (Mu + 2 dt D^T K Mtau U D) u
    (comment at cpp:424).

Case analysis per edge-stress face slot (getEdgeStressFaces, cpp:1717-1908):
  T1  active face                      -> +-0.5/gdx (or 0.25 when enhanced)
  T2  enhanced-gradient sibling        -> 0.25/gdx, in-axis parity offset
  T3  coarse transition (even edge)    -> parent face, 0.5/gdx
  T4  dangling edge (odd), parent live -> two parent faces, 0.25/gdx each
  T5  dangling edge, parent unassigned -> four inset child faces, 0.0625/gdx
  SB  solid boundary face              -> RHS, 0.5 * u_solid / gdx

Center-stress slots (getCenterStressFaces, cpp:1910-1963):
  C1  active face        -> +-1/dx
  C2  unassigned (l>0)   -> four child faces, 0.25/dx each
  SB  solid boundary     -> RHS, u_solid/dx

Units follow the reference exactly: gradient spacings in world units,
control volumes in finest-cell index units (cpp:1965-2057) — a uniform
scaling of the whole system.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import classify, octree
from .config import SolverConfig
from .fields import _axis_lerp
from .ops.arrayops import (
    edge_shape,
    face_shape,
    gather_offset,
    upread,
)

FLUID = classify.FLUID
UNASSIGNED = classify.UNASSIGNED
SOLIDBOUNDARY = classify.SOLIDBOUNDARY
OUTSIDE = classify.OUTSIDE


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["coeff"],
    meta_fields=["lift", "face_axis", "src_level", "offset"],
)
@dataclasses.dataclass
class StressTerm:
    """One dense contribution ``tau += coeff * gather(lift(u_src), offset)``."""

    lift: str            # 'same' | 'parent' | 'childsum' | 'blocksum'
    face_axis: int       # axis of the velocity faces read
    src_level: int       # level of the source velocity grid
    offset: Tuple[int, int, int]  # applied after the lift (face -> stress grid)
    coeff: jnp.ndarray   # stress-grid-shaped; zero where the case is inactive


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["weight", "terms", "boundary"],
    meta_fields=["kind", "level", "axis"],
)
@dataclasses.dataclass
class StressBlock:
    """All terms + integration weight for one stress grid."""

    kind: str            # 'edge' | 'center'
    level: int
    axis: int            # edge axis, or center-stress component axis
    weight: jnp.ndarray  # w_s = 4 dt mu V (edge) / 2 dt mu V (center); 0 off-row
    terms: List[StressTerm]
    boundary: Optional[jnp.ndarray]  # raw b_s (solid-velocity terms), level 0 only


def sample_cell_field_at(field: jnp.ndarray, level: int, kind: str, axis: int | None = None):
    """Trilinear sample of a finest-level cell field at level-``level``
    center/edge/face positions (the reference's world-space ``getValue``)."""
    s = 1 << level
    n = field.shape
    if kind == "center":
        c = [s * 0.5 - 0.5] * 3
        m = [d // s for d in n]
    elif kind == "edge":
        c = [s * 0.5 - 0.5 if d == axis else -0.5 for d in range(3)]
        m = [n[d] // s + (0 if d == axis else 1) for d in range(3)]
    elif kind == "face":
        c = [-0.5 if d == axis else s * 0.5 - 0.5 for d in range(3)]
        m = [n[d] // s + (1 if d == axis else 0) for d in range(3)]
    else:
        raise ValueError(kind)
    out = field
    for d in range(3):
        pad = [(0, 0)] * 3
        pad[d] = (1, 1)
        g = jnp.pad(out, pad, mode="edge")
        cc = c[d] + 1.0
        b = math.floor(cc)
        h = _axis_lerp(g, d, cc - b)
        idx = [slice(None)] * 3
        idx[d] = slice(b, b + s * (m[d] - 1) + 1, s)
        out = h[tuple(idx)]
    return out


def _face_avg_component(solid_velocity, comp_axis, face_axis, eshape, off):
    """Solid-velocity component ``comp_axis`` interpolated at the centers of
    ``face_axis`` faces (world trilinear of the MAC field), gathered onto the
    edge grid — only used by compat_edge_boundary_component."""
    sv = solid_velocity[comp_axis]
    # comp faces -> face_axis face centers: average along comp_axis pairs
    # (moves samples to cell centers along comp), then along face_axis
    # staggered offset.  For aligned MAC grids this is the 4-sample mean.
    x = 0.5 * (sv[tuple(slice(0, -1) if d == comp_axis else slice(None)
                        for d in range(3))]
               + sv[tuple(slice(1, None) if d == comp_axis else slice(None)
                          for d in range(3))])  # cell-centered comp velocity
    from .fields import cell_to_face_avg

    y = cell_to_face_avg(x, face_axis)  # face-axis face centers
    return gather_offset(y, eshape, off)


def _parity(shape, axis, even: bool):
    idx = jnp.arange(shape[axis]).reshape([shape[axis] if d == axis else 1 for d in range(3)])
    p = (idx % 2 == 0) if even else (idx % 2 == 1)
    return jnp.broadcast_to(p, shape)


def _unit(axis, sign=1):
    off = [0, 0, 0]
    off[axis] = sign
    return tuple(off)


def _add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def build_edge_stress_blocks(
    labels: Sequence[jnp.ndarray],
    vel_kinds: Sequence[Sequence[jnp.ndarray]],
    edge_kinds: Sequence[Sequence[jnp.ndarray]],
    edge_w0: Sequence[jnp.ndarray],
    viscosity: jnp.ndarray,
    solid_velocity: Sequence[jnp.ndarray],
    dt,
    dx: float,
    config: SolverConfig,
    with_weights: bool = True,
) -> List[StressBlock]:
    """Edge (shear) stress term bundles per level/axis
    (buildEdgeStressStencilsPartial, cpp:2059-2160).

    ``with_weights=False`` skips the integration-weight/boundary arrays —
    used when terms are rebuilt inside the CG loop so the (loop-invariant)
    coefficient construction trades HBM reads for cheap int8 recompute.

    Note: for solid-boundary faces the reference samples the *edge-axis*
    component of the solid velocity (cpp:1901) although the face being
    replaced carries the face-axis component; that reads like an index slip —
    we use the face-axis component (the physically consistent choice).
    """
    levels = len(labels)
    blocks = []
    for level in range(levels):
        res = labels[level].shape
        dxw = dx * (1 << level)
        dxi = float(1 << level)
        for a in range(3):
            eshape = edge_shape(res, a)
            active_edge = edge_kinds[level][a] == FLUID
            f_axes = [f for f in range(3) if f != a]

            # slot kinds + per-gradient-axis spacing / transition masks
            slot_kind = {}
            for f in f_axes:
                g = 3 - a - f
                for d in (0, 1):
                    off = _unit(g, d - 1) if d == 0 else (0, 0, 0)
                    slot_kind[(f, d)] = gather_offset(
                        vel_kinds[level][f], eshape, off, fill=OUTSIDE
                    )
            fdtype = viscosity.dtype
            gdx, is_trans, is_out, n_unassigned = {}, {}, {}, {}
            for f in f_axes:
                g = 3 - a - f
                k0, k1 = slot_kind[(f, 0)], slot_kind[(f, 1)]
                u = (k0 == UNASSIGNED).astype(fdtype) + (k1 == UNASSIGNED).astype(fdtype)
                n_unassigned[g] = u
                gdx[g] = dxw * (1.0 + 0.5 * u)
                is_trans[g] = (
                    ((k0 == UNASSIGNED) | (k1 == UNASSIGNED))
                    if config.use_enhanced_gradients
                    else jnp.zeros(eshape, bool)
                )
                is_out[g] = (
                    (k0 == OUTSIDE) | (k0 == SOLIDBOUNDARY)
                    | (k1 == OUTSIDE) | (k1 == SOLIDBOUNDARY)
                )

            terms: List[StressTerm] = []
            boundary = None
            for f in f_axes:
                g = 3 - a - f
                base_inv = 1.0 / gdx[g]
                enh = is_trans[g] & ~is_out[g]
                for d in (0, 1):
                    off = _unit(g, d - 1) if d == 0 else (0, 0, 0)
                    sign = -1.0 if d == 0 else 1.0
                    k = slot_kind[(f, d)]
                    act = (k == FLUID) & active_edge
                    base = sign * base_inv

                    # T1: the face itself
                    c1 = jnp.where(act, jnp.where(enh, 0.25, 0.5) * base, 0.0)
                    terms.append(StressTerm("same", f, level, off, c1))
                    # T2: enhanced-gradient sibling (in-edge-axis parity offset,
                    # cpp:1813-1824)
                    for even, so in ((True, 1), (False, -1)):
                        c2 = jnp.where(
                            act & enh & _parity(eshape, a, even), 0.25 * base, 0.0
                        )
                        terms.append(
                            StressTerm("same", f, level, _add(off, _unit(a, so)), c2)
                        )

                    una = (k == UNASSIGNED) & active_edge
                    dangling = _parity(eshape, f, even=False)
                    if level + 1 < levels:
                        # T3: non-dangling coarse transition -> parent face
                        c3 = jnp.where(una & ~dangling, 0.5 * base, 0.0)
                        terms.append(StressTerm("parent", f, level + 1, off, c3))
                        # T4/T5: dangling edge -> two parent faces or their
                        # four inset children (cpp:1829-1895)
                        parent_face_kind = upread(
                            vel_kinds[level + 1][f], face_shape(res, f)
                        )
                        for so in (-1, 1):
                            offo = _add(off, _unit(f, so))
                            kp = gather_offset(parent_face_kind, eshape, offo, fill=OUTSIDE)
                            c4 = jnp.where(
                                una & dangling & (kp == FLUID), 0.25 * base, 0.0
                            )
                            terms.append(StressTerm("parent", f, level + 1, offo, c4))
                            c5 = jnp.where(
                                una & dangling & (kp == UNASSIGNED), 0.0625 * base, 0.0
                            )
                            terms.append(StressTerm("blocksum", f, level, offo, c5))

                    if level == 0:
                        sb = (k == SOLIDBOUNDARY) & active_edge
                        if config.compat_edge_boundary_component:
                            # reference behavior (cpp:1901): edge-axis
                            # component sampled at the face center
                            svc = _face_avg_component(
                                solid_velocity, a, f, eshape, off
                            )
                        else:
                            svc = gather_offset(solid_velocity[f], eshape, off)
                        contrib = jnp.where(sb, 0.5 * base * svc, 0.0)
                        boundary = contrib if boundary is None else boundary + contrib

            if with_weights:
                # integration weight (cpp:2124-2155): stretched index-unit
                # volume
                vol = dxi  # along the edge axis
                for f in f_axes:
                    g = 3 - a - f
                    vol = vol * dxi * (1.0 + 0.5 * n_unassigned[g])
                if level == 0:
                    w0 = edge_w0[a].astype(fdtype)
                    vol = jnp.where(w0 == 1.0, vol, w0)
                visc = sample_cell_field_at(viscosity, level, "edge", a)
                weight = jnp.where(active_edge, 4.0 * dt * vol * visc, 0.0)
            else:
                weight = None
                boundary = None

            blocks.append(StressBlock("edge", level, a, weight, terms, boundary))
    return blocks


def build_center_stress_blocks(
    labels: Sequence[jnp.ndarray],
    vel_kinds: Sequence[Sequence[jnp.ndarray]],
    center_kinds: Sequence[jnp.ndarray],
    center_w0: jnp.ndarray,
    viscosity: jnp.ndarray,
    solid_velocity: Sequence[jnp.ndarray],
    dt,
    dx: float,
    config: SolverConfig,
    with_weights: bool = True,
) -> List[StressBlock]:
    """Center (normal) stress term bundles per level and component axis
    (buildCenterStressStencilsPartial + weights, cpp:2162-2289)."""
    levels = len(labels)
    blocks = []
    for level in range(levels):
        res = labels[level].shape
        dxw = dx * (1 << level)
        dxi = float(1 << level)
        active_c = center_kinds[level] == FLUID
        if with_weights:
            # weight shared across the three component axes (cpp:2184-2186)
            if level == 0:
                vol = center_w0.astype(viscosity.dtype)
            else:
                vol = jnp.full(res, dxi ** 3, viscosity.dtype)
            visc = sample_cell_field_at(viscosity, level, "center")
            weight = jnp.where(active_c, 2.0 * dt * vol * visc, 0.0)
        else:
            weight = None

        for axis in range(3):
            terms: List[StressTerm] = []
            boundary = None
            for d in (0, 1):
                off = (0, 0, 0) if d == 0 else _unit(axis, 1)
                sign = -1.0 if d == 0 else 1.0
                k = gather_offset(vel_kinds[level][axis], res, off, fill=OUTSIDE)
                act = (k == FLUID) & active_c
                terms.append(
                    StressTerm(
                        "same", axis, level, off,
                        jnp.where(act, sign / dxw, 0.0),
                    )
                )
                if level > 0:
                    una = (k == UNASSIGNED) & active_c
                    terms.append(
                        StressTerm(
                            "childsum", axis, level - 1, off,
                            jnp.where(una, 0.25 * sign / dxw, 0.0),
                        )
                    )
                if level == 0:
                    sb = (k == SOLIDBOUNDARY) & active_c
                    sv = gather_offset(solid_velocity[axis], res, off)
                    contrib = jnp.where(sb, sign / dxw * sv, 0.0)
                    boundary = contrib if boundary is None else boundary + contrib
            blocks.append(StressBlock(
                "center", level, axis, weight, terms,
                boundary if with_weights else None,
            ))
    return blocks


def build_mass(
    labels: Sequence[jnp.ndarray],
    vel_kinds: Sequence[Sequence[jnp.ndarray]],
    face_w0: Sequence[jnp.ndarray],
    density: jnp.ndarray,
) -> Dict[Tuple[int, int], jnp.ndarray]:
    """Lumped mass per velocity DOF: density * stretched face control volume
    (faceOctreeVolumes, cpp:1965-2002 + level-0 face weights, cpp:2746-2766).
    Index-unit volumes, zero on non-FLUID faces."""
    mass = {}
    for level, lab in enumerate(labels):
        res = lab.shape
        dxi = float(1 << level)
        for a in range(3):
            fshape = face_shape(res, a)
            active = vel_kinds[level][a] == FLUID
            gdx = jnp.zeros(fshape, density.dtype)
            for d in (0, 1):
                off = _unit(a, d - 1) if d == 0 else (0, 0, 0)
                lk = gather_offset(lab, fshape, off, fill=octree.INACTIVE)
                gdx = gdx + jnp.where(lk == octree.UP, dxi, 0.5 * dxi)
            vol = dxi * dxi * gdx
            if level == 0:
                w0 = face_w0[a].astype(density.dtype)
                vol = jnp.where(w0 == 1.0, vol, w0)
            rho = sample_cell_field_at(density, level, "face", a)
            mass[(level, a)] = jnp.where(active, vol * rho, 0.0)
    return mass
