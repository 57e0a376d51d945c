"""T-junction-consistent octree velocity interpolation.

Dense reimplementation of HDK_OctreeVectorFieldInterpolator
(/root/reference/Source/HDK_OctreeVectorFieldInterpolator.{h,cpp}): build
per-level node-sampled velocities that agree across T-junctions, then
evaluate the velocity at arbitrary level-0 face centers inside coarsened
regions (the writeback path, cpp:2868-2876).

Pipeline (ctor, h:30-138), each phase a set of whole-array passes:

  1. set_active_nodes       — node touches an indexed face, no solid/outside
  2. sample_active_nodes    — accumulate the 12 adjacent faces, weight
                              2^(L-level-1), 12-bit completeness flags
  3. bubble                 — even-index nodes merge into co-located parents
  4. finish_incomplete      — T-junction/dangling nodes fill missing flag
                              bits from parent faces or by climbing to the
                              active cell and lerping its big/child faces
  5. normalize              — value /= weight
  6. distribute_down        — parents copy values to DEPENDENT children

The point query (interpSPGrid, cpp:660-845) is evaluated *densely for every
level-0 face at once*: each "read grid X at the containing coarse index"
becomes a uniform gather — ``upread`` to the fine grid plus an integer
offset — so the whole query is branch-free masked arithmetic, unrolled over
the (static) level count.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from . import classify, octree
from .ops.arrayops import (
    face_child_mean,
    face_shape,
    gather_offset,
    node_shape,
    upread,
    upread_k,
)

FLUID = classify.FLUID
UNASSIGNED = classify.UNASSIGNED
SOLIDBOUNDARY = classify.SOLIDBOUNDARY
OUTSIDE = classify.OUTSIDE

INACTIVE_NODE = 0
ACTIVE_NODE = 1
DEPENDENT_NODE = 2


def _node_face_slots(f):
    """The 4 faces adjacent to a node for face axis ``f``: offsets in
    {-1, 0} on the two transverse axes (HDKnodeToFace, HDK_Utilities.h:187)."""
    t1, t2 = (f + 1) % 3, (f + 2) % 3
    slots = []
    for fi in range(4):
        off = [0, 0, 0]
        if not (fi & 1):
            off[t1] -= 1
        if not (fi & 2):
            off[t2] -= 1
        slots.append((fi, tuple(off)))
    return slots


def _iota_mod(shape, axis, mod):
    idx = jnp.arange(shape[axis]).reshape(
        [shape[axis] if d == axis else 1 for d in range(3)]
    )
    return jnp.broadcast_to(idx % mod, shape)


def build_node_velocities(
    labels: Sequence[jnp.ndarray],
    u: Dict[Tuple[int, int], jnp.ndarray],
    vel_kinds: Sequence[Sequence[jnp.ndarray]],
):
    """Phases 1-6; returns (node_values[level][axis], node_labels[level])."""
    levels = len(labels)
    dtype = u[(0, 0)].dtype
    nshapes = [node_shape(l.shape) for l in labels]

    node_label: List[jnp.ndarray] = []
    node_vals: List[List[jnp.ndarray]] = []
    node_wts: List[List[jnp.ndarray]] = []
    flags: List[jnp.ndarray] = []

    # Phase 1 + 2 (cpp:118-286)
    for level in range(levels):
        ns = nshapes[level]
        w = float(1 << (levels - level - 1))
        any_active = jnp.zeros(ns, bool)
        any_blocked = jnp.zeros(ns, bool)
        vals = [jnp.zeros(ns, dtype) for _ in range(3)]
        wts = [jnp.zeros(ns, dtype) for _ in range(3)]
        flg = jnp.zeros(ns, jnp.int32)
        for f in range(3):
            for fi, off in _node_face_slots(f):
                k = gather_offset(vel_kinds[level][f], ns, off, fill=OUTSIDE)
                uf = gather_offset(u[(level, f)], ns, off)
                is_fluid = k == FLUID
                is_closed = (k == SOLIDBOUNDARY) | (k == OUTSIDE)
                any_active |= is_fluid
                any_blocked |= is_closed
                vals[f] = vals[f] + jnp.where(is_fluid, w * uf, 0.0)
                wts[f] = wts[f] + jnp.where(is_fluid | is_closed, w, 0.0)
                flg = flg + jnp.where(
                    is_fluid | is_closed, jnp.int32(1 << (f * 4 + fi)), 0
                )
        lab = jnp.where(any_active & ~any_blocked, jnp.int8(ACTIVE_NODE),
                        jnp.int8(INACTIVE_NODE))
        node_label.append(lab)
        node_vals.append(vals)
        node_wts.append(wts)
        flags.append(flg)

    # Phase 3: bubble co-located values upward (cpp:288-355)
    for level in range(levels - 1):
        child_lab = node_label[level]
        child_even = child_lab[::2, ::2, ::2]
        parent_lab = node_label[level + 1]
        merge = (child_even == ACTIVE_NODE) & (parent_lab == ACTIVE_NODE)
        flags[level + 1] = flags[level + 1] + jnp.where(
            merge, flags[level][::2, ::2, ::2], 0
        )
        for f in range(3):
            node_vals[level + 1][f] = node_vals[level + 1][f] + jnp.where(
                merge, node_vals[level][f][::2, ::2, ::2], 0.0
            )
            node_wts[level + 1][f] = node_wts[level + 1][f] + jnp.where(
                merge, node_wts[level][f][::2, ::2, ::2], 0.0
            )
        # mark merged children DEPENDENT
        merge_fine = jnp.zeros(child_lab.shape, bool)
        merge_fine = merge_fine.at[::2, ::2, ::2].set(merge)
        node_label[level] = jnp.where(merge_fine, jnp.int8(DEPENDENT_NODE), child_lab)

    # Composite face fields for the climb: FLUID face value, else mean of its
    # 4 children (cpp:503-535 reads child faces when the big face is
    # unassigned).
    comp = {}
    for level in range(levels):
        for f in range(3):
            fs = face_shape(labels[level].shape, f)
            val = jnp.where(vel_kinds[level][f] == FLUID, u[(level, f)], 0.0)
            if level > 0:
                child_mean = face_child_mean(u[(level - 1, f)], f, fs)
                val = jnp.where(
                    vel_kinds[level][f] == UNASSIGNED, child_mean, val
                )
            comp[(level, f)] = val

    # Active-ancestor level per cell, as fine masks per (level, search level)
    first_active: List[jnp.ndarray] = []  # per level: level index of ancestor
    BIG = jnp.int32(127)
    cur = jnp.where(labels[levels - 1] == octree.ACTIVE,
                    jnp.int32(levels - 1), BIG)
    first_active.insert(0, cur)
    for level in range(levels - 2, -1, -1):
        parent = upread(first_active[0], labels[level].shape)
        cur = jnp.where(labels[level] == octree.ACTIVE, jnp.int32(level), parent)
        first_active.insert(0, cur)

    # Phase 4: finish incomplete nodes (cpp:357-567), ascending levels
    for level in range(levels - 1):
        ns = nshapes[level]
        w = float(1 << (levels - level - 1))
        incomplete = (node_label[level] == ACTIVE_NODE) & (flags[level] != 0xFFF)
        for f in range(3):
            for fi, off in _node_face_slots(f):
                bit = 1 << (f * 4 + fi)
                missing = incomplete & ((flags[level] & bit) == 0)

                # Case A: node even along f -> parent face may be live
                # (cpp:441-467)
                even_f = _iota_mod(ns, f, 2) == 0
                pk = gather_offset(
                    upread(vel_kinds[level + 1][f], face_shape(labels[level].shape, f)),
                    ns, off, fill=OUTSIDE,
                )
                pu = gather_offset(
                    upread(u[(level + 1, f)], face_shape(labels[level].shape, f)),
                    ns, off,
                )
                case_a = missing & even_f & (pk == FLUID)
                node_vals[level][f] = node_vals[level][f] + jnp.where(
                    case_a, w * pu, 0.0
                )
                node_wts[level][f] = node_wts[level][f] + jnp.where(case_a, w, 0.0)

                # Case B (odd node along f only, cpp:469-472): climb to the
                # containing active cell and lerp its two f-faces (big or
                # child-averaged), cpp:474-552.
                case_b = missing & ~even_f
                al = gather_offset(first_active[level], ns, off, fill=BIG)
                ghost = jnp.zeros(ns, dtype)
                for sl in range(level + 1, levels):
                    d = sl - level
                    sel = case_b & (al == sl)
                    # t = frac of the face position along f in level-sl units
                    t = (_iota_mod(ns, f, 1 << d).astype(dtype)) / float(1 << d)
                    fshape_l = face_shape(labels[level].shape, f)
                    lifted = upread_k(comp[(sl, f)], fshape_l, d)
                    v0 = gather_offset(lifted, ns, off)
                    v1 = gather_offset(
                        lifted, ns,
                        tuple(o + (1 << d) if ax == f else o
                              for ax, o in enumerate(off)),
                    )
                    gv = (1.0 - t) * v0 + t * v1
                    ghost = jnp.where(sel, gv, ghost)
                node_vals[level][f] = node_vals[level][f] + jnp.where(
                    case_b, w * ghost, 0.0
                )
                node_wts[level][f] = node_wts[level][f] + jnp.where(case_b, w, 0.0)

    # Phase 5: normalize (cpp:569-613)
    for level in range(levels):
        act = node_label[level] == ACTIVE_NODE
        for f in range(3):
            node_vals[level][f] = jnp.where(
                act, node_vals[level][f] / jnp.maximum(node_wts[level][f], 1e-30),
                node_vals[level][f],
            )

    # Phase 6: distribute down (cpp:615-658), descending
    for level in range(levels - 2, -1, -1):
        dep = node_label[level] == DEPENDENT_NODE
        for f in range(3):
            pv = upread(node_vals[level + 1][f], nshapes[level])
            node_vals[level][f] = jnp.where(dep, pv, node_vals[level][f])
        node_label[level] = jnp.where(dep, jnp.int8(ACTIVE_NODE), node_label[level])

    return node_vals, node_label


def _iota(shape, axis):
    idx = jnp.arange(shape[axis]).reshape(
        [shape[axis] if d == axis else 1 for d in range(3)]
    )
    return jnp.broadcast_to(idx, shape)


def interpolate_level0_faces(
    labels: Sequence[jnp.ndarray],
    u: Dict[Tuple[int, int], jnp.ndarray],
    vel_kinds: Sequence[Sequence[jnp.ndarray]],
    node_vals,
    axis: int,
) -> jnp.ndarray:
    """interpSPGrid (cpp:660-845) evaluated at every level-0 face center of
    ``axis`` simultaneously.

    Descend the pyramid to the first ACTIVE containing cell; trilinear over
    the 8 surrounding faces when all are assigned, else the node-based
    bilinear + pyramid-bump path with child-face selection.  Every coarse
    read is a uniform gather (``upread_k`` + integer offset); the level
    descent is an unrolled masked fold.
    """
    from .ops.arrayops import even_snap

    levels = len(labels)
    res0 = labels[0].shape
    fs0 = face_shape(res0, axis)
    dtype = u[(0, 0)].dtype
    t_axes = [d for d in range(3) if d != axis]

    result = jnp.zeros(fs0, dtype)
    found = jnp.zeros(fs0, bool)

    FA = _iota(fs0, axis)
    FT = {t: _iota(fs0, t) for t in t_axes}

    for l in range(levels):
        h = 1 << l
        h2 = h // 2  # 0 at level 0

        cl = upread_k(labels[l], res0, l)
        is_active = gather_offset(cl, fs0, (0, 0, 0), fill=octree.INACTIVE) == octree.ACTIVE

        # ---- fast path: all 8 surrounding faces assigned (cpp:683-728)
        ku = upread_k(vel_kinds[l][axis], face_shape(res0, axis), l)
        uu = upread_k(u[(l, axis)], face_shape(res0, axis), l)
        fa = (FA % h).astype(dtype) / h
        ft = {t: (((FT[t] - h2) % h).astype(dtype) + 0.5) / h for t in t_axes}
        fast_val = jnp.zeros(fs0, dtype)
        at_transition = jnp.zeros(fs0, bool)
        for b0 in (0, 1):
            for b1 in (0, 1):
                for b2 in (0, 1):
                    bb = {axis: b0, t_axes[0]: b1, t_axes[1]: b2}
                    off = tuple(
                        (bb[d] * h) if d == axis else (-h2 + bb[d] * h)
                        for d in range(3)
                    )
                    kk = gather_offset(ku, fs0, off, fill=OUTSIDE)
                    vv = gather_offset(uu, fs0, off)
                    at_transition |= kk == UNASSIGNED
                    w = (fa if b0 else (1.0 - fa))
                    for t in t_axes:
                        w = w * (ft[t] if bb[t] else (1.0 - ft[t]))
                    fast_val = fast_val + w * vv

        # ---- node path (cpp:729-837)
        t_cell = fa
        dir_vals = []
        for direction in (0, 1):
            off_in = direction * h
            k_dir = gather_offset(ku, fs0, (off_in if axis == 0 else 0,
                                            off_in if axis == 1 else 0,
                                            off_in if axis == 2 else 0),
                                  fill=OUTSIDE)
            big_u = gather_offset(uu, fs0, tuple(off_in if d == axis else 0
                                                 for d in range(3)))
            use_child = (k_dir == UNASSIGNED) if l > 0 else jnp.zeros(fs0, bool)

            # face velocity (big or selected child, cpp:753-790)
            if l > 0:
                cu = upread_k(even_snap(u[(l - 1, axis)], axis),
                              face_shape(res0, axis), l - 1)
                child_u = gather_offset(cu, fs0, tuple(off_in if d == axis else 0
                                                       for d in range(3)))
                face_u = jnp.where(use_child, child_u, big_u)
            else:
                face_u = big_u

            # node bilinear + pyramid bump at the face's level
            def node_interp(fl, snapped):
                hh = 1 << fl
                nv = node_vals[fl][axis]
                if snapped:
                    nv = even_snap(nv, axis)
                nvu = upread_k(nv, tuple(s + 1 for s in res0), fl)
                fw = {t: (((FT[t] % hh).astype(dtype)) + 0.5) / hh for t in t_axes}
                bil = jnp.zeros(fs0, dtype)
                avg = jnp.zeros(fs0, dtype)
                for b1 in (0, 1):
                    for b2 in (0, 1):
                        bb = {t_axes[0]: b1, t_axes[1]: b2}
                        off = tuple(
                            off_in if d == axis else bb[d] * hh for d in range(3)
                        )
                        nn = gather_offset(nvu, fs0, off)
                        w = jnp.ones(fs0, dtype)
                        for t in t_axes:
                            w = w * (fw[t] if bb[t] else (1.0 - fw[t]))
                        bil = bil + w * nn
                        avg = avg + nn
                bump_w = jnp.minimum(
                    jnp.minimum(fw[t_axes[0]], 1.0 - fw[t_axes[0]]),
                    jnp.minimum(fw[t_axes[1]], 1.0 - fw[t_axes[1]]),
                )
                return bil, avg, bump_w

            bil_b, avg_b, bw_b = node_interp(l, snapped=False)
            if l > 0:
                bil_c, avg_c, bw_c = node_interp(l - 1, snapped=True)
                bil = jnp.where(use_child, bil_c, bil_b)
                avg = jnp.where(use_child, avg_c, avg_b)
                bw = jnp.where(use_child, bw_c, bw_b)
            else:
                bil, avg, bw = bil_b, avg_b, bw_b
            dir_vals.append(bil + 2.0 * (face_u - 0.25 * avg) * bw)

        node_val = (1.0 - t_cell) * dir_vals[0] + t_cell * dir_vals[1]

        value = jnp.where(at_transition, node_val, fast_val)
        result = jnp.where(found | ~is_active, result, value)
        found = found | is_active

    return result


def _read3(arr: jnp.ndarray, idx: jnp.ndarray, fill):
    """``arr[idx]`` for an integer index triple; out-of-bounds reads ``fill``."""
    shp = jnp.asarray(arr.shape, idx.dtype)
    ok = jnp.all((idx >= 0) & (idx < shp))
    c = jnp.clip(idx, 0, shp - 1)
    return jnp.where(ok, arr[c[0], c[1], c[2]], fill)


def _interp_one(labels, u, vel_kinds, node_vals, pos, axis):
    """interpSPGrid (cpp:660-845) for ONE point, branch-free.

    ``pos`` is a float triple in fine-cell index units (cell centers at
    ``i + 0.5``).  The level descent is unrolled over the static level count;
    both the trilinear fast path and the node/pyramid-bump path are evaluated
    masked and selected, so the function jits and vmaps cleanly.
    """
    levels = len(labels)
    dtype = u[(0, 0)].dtype
    pos = pos.astype(dtype)
    t_axes = [d for d in range(3) if d != axis]
    e_axis = jnp.asarray([1 if d == axis else 0 for d in range(3)], jnp.int32)
    cell0 = jnp.floor(pos).astype(jnp.int32)

    def face_branch(fl, af):
        """Node-bilinear + pyramid bump on face ``af`` at level ``fl``
        (cpp:794-837)."""
        hh = 1 << fl
        ph = pos / hh
        fw = [ph[t] - jnp.floor(ph[t]) for t in t_axes]
        face_u = _read3(u[(fl, axis)], af, jnp.zeros((), dtype))
        bil = jnp.zeros((), dtype)
        avg = jnp.zeros((), dtype)
        for b0 in (0, 1):
            for b1 in (0, 1):
                bb = {t_axes[0]: b0, t_axes[1]: b1}
                nd = af + jnp.asarray(
                    [bb.get(d, 0) for d in range(3)], jnp.int32
                )
                nv = _read3(node_vals[fl][axis], nd, jnp.zeros((), dtype))
                w = (fw[0] if b0 else 1.0 - fw[0]) * (fw[1] if b1 else 1.0 - fw[1])
                bil = bil + w * nv
                avg = avg + nv
        bump_w = jnp.minimum(
            jnp.minimum(fw[0], 1.0 - fw[0]), jnp.minimum(fw[1], 1.0 - fw[1])
        )
        return bil + 2.0 * (face_u - 0.25 * avg) * bump_w

    result = jnp.zeros((), dtype)
    found = jnp.zeros((), bool)
    for level in range(levels):
        h = 1 << level
        cell = cell0 >> level
        lab = _read3(labels[level], cell, jnp.int8(octree.INACTIVE))
        is_active = lab == octree.ACTIVE

        # ---- fast path: trilinear over the 8 surrounding faces (cpp:683-728)
        fpt = pos / h - jnp.asarray(
            [0.0 if d == axis else 0.5 for d in range(3)], dtype
        )
        bf = jnp.floor(fpt).astype(jnp.int32)
        fr = jnp.clip(fpt - bf, 0.0, 1.0)
        fast_val = jnp.zeros((), dtype)
        at_transition = jnp.zeros((), bool)
        for fi in range(8):
            b = jnp.asarray([(fi >> d) & 1 for d in range(3)], jnp.int32)
            nb = bf + b
            k = _read3(vel_kinds[level][axis], nb, jnp.int8(OUTSIDE))
            at_transition |= k == UNASSIGNED
            uv = _read3(u[(level, axis)], nb, jnp.zeros((), dtype))
            w = jnp.prod(jnp.where(b == 1, fr, 1.0 - fr))
            fast_val = fast_val + w * uv

        # ---- node path (cpp:729-837)
        t_cell = jnp.clip(pos[axis] / h - cell[axis], 0.0, 1.0)
        dir_vals = []
        for direction in (0, 1):
            af = cell + direction * e_axis
            k_dir = _read3(vel_kinds[level][axis], af, jnp.int8(OUTSIDE))
            same_val = face_branch(level, af)
            if level > 0:
                # big face unassigned -> the child face whose transverse
                # span contains the point (cpp:753-790)
                child_pt = pos / (1 << (level - 1))
                cf = 2 * af + jnp.asarray(
                    [
                        0 if d == axis
                        else (child_pt[d] - 2 * af[d] > 1.0).astype(jnp.int32)
                        for d in range(3)
                    ],
                    jnp.int32,
                )
                child_val = face_branch(level - 1, cf)
                dir_vals.append(
                    jnp.where(k_dir == UNASSIGNED, child_val, same_val)
                )
            else:
                dir_vals.append(same_val)
        node_val = (1.0 - t_cell) * dir_vals[0] + t_cell * dir_vals[1]

        value = jnp.where(at_transition, node_val, fast_val)
        result = jnp.where(found | ~is_active, result, value)
        found = found | is_active
    return result


def interp_at(
    labels: Sequence[jnp.ndarray],
    u: Dict[Tuple[int, int], jnp.ndarray],
    vel_kinds: Sequence[Sequence[jnp.ndarray]],
    node_vals,
    points: jnp.ndarray,
    axis: int,
) -> jnp.ndarray:
    """T-junction-consistent velocity component at arbitrary positions.

    The public point-query API of the reference interpolator,
    ``interpSPGrid(pos, axis)``
    (/root/reference/Source/HDK_OctreeVectorFieldInterpolator.cpp:660-845,
    .h:140).  ``points`` is ``(N, 3)`` in fine-cell index units (divide world
    coordinates by ``dx`` first); ``node_vals`` comes from
    :func:`build_node_velocities`.  Points whose containing column has no
    ACTIVE cell at any level return 0.
    """
    import jax

    return jax.vmap(
        lambda p: _interp_one(labels, u, vel_kinds, node_vals, p, axis)
    )(points)


def make_point_interpolator(labels, u, vel_kinds):
    """Build the node pyramid once, return ``query(points, axis)``.

    The factory analog of constructing HDK_OctreeVectorFieldInterpolator
    (h:30-138) and then calling interpSPGrid per sample."""
    node_vals, _ = build_node_velocities(labels, u, vel_kinds)

    def query(points: jnp.ndarray, axis: int) -> jnp.ndarray:
        return interp_at(labels, u, vel_kinds, node_vals, points, axis)

    return query


def interpolate_writeback_fields(labels, u, vel_kinds, levels):
    """Node pipeline + per-axis dense interpSPGrid — the values consumed by
    writeback at UNASSIGNED level-0 faces."""
    node_vals, _ = build_node_velocities(labels, u, vel_kinds)
    return [
        interpolate_level0_faces(labels, u, vel_kinds, node_vals, a)
        for a in range(3)
    ]
