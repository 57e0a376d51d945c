"""Per-cell numpy oracle of the reference algorithm, for testing only.

This module re-derives the reference's semantics (cited per function) with
straightforward Python loops — deliberately a *different* implementation
style from the vectorized TPU library, so agreement is meaningful evidence.
Use tiny grids (16^3/32^3): it is O(cells) Python.
"""

from __future__ import annotations

import numpy as np

INACTIVE, ACTIVE, UP, DOWN = 0, 1, 2, 3
FLUID, UNASSIGNED, SOLIDBOUNDARY, OUTSIDE = 0, -1, -2, -3


# ---------------------------------------------------------------------------
# Topology algebra (HDK_Utilities.h:46-217)
# ---------------------------------------------------------------------------

def cell_to_face(cell, axis, direction):
    f = list(cell)
    if direction == 1:
        f[axis] += 1
    return tuple(f)


def cell_to_cell(cell, axis, direction):
    c = list(cell)
    c[axis] += 1 if direction == 1 else -1
    return tuple(c)


def face_to_cell(face, axis, direction):
    c = list(face)
    if direction == 0:
        c[axis] -= 1
    return tuple(c)


def face_to_edge(face, face_axis, edge_axis, direction):
    e = list(face)
    if direction == 1:
        e[3 - face_axis - edge_axis] += 1
    return tuple(e)


def edge_to_face(edge, edge_axis, face_axis, direction):
    f = list(edge)
    if direction == 0:
        f[3 - face_axis - edge_axis] -= 1
    return tuple(f)


def edge_to_cell(edge, edge_axis, cell_index):
    c = list(edge)
    for bit in (0, 1):
        if not (cell_index & (1 << bit)):
            c[(edge_axis + 1 + bit) % 3] -= 1
    return tuple(c)


def cell_to_edge(cell, edge_axis, edge_index):
    e = list(cell)
    for bit in (0, 1):
        if edge_index & (1 << bit):
            e[(edge_axis + 1 + bit) % 3] += 1
    return tuple(e)


def cell_to_node(cell, node_index):
    n = list(cell)
    for axis in range(3):
        if node_index & (1 << axis):
            n[axis] += 1
    return tuple(n)


def face_to_node(face, face_axis, node_index):
    n = list(face)
    for bit in (0, 1):
        if node_index & (1 << bit):
            n[(face_axis + 1 + bit) % 3] += 1
    return tuple(n)


def node_to_face(node, face_axis, face_index):
    f = list(node)
    for bit in (0, 1):
        if not (face_index & (1 << bit)):
            f[(face_axis + 1 + bit) % 3] -= 1
    return tuple(f)


def node_to_cell(node, cell_index):
    c = list(node)
    for axis in range(3):
        if not (cell_index & (1 << axis)):
            c[axis] -= 1
    return tuple(c)


def parent(idx):
    return tuple(i // 2 for i in idx)


def child_cell(cell, child_index):
    c = [2 * i for i in cell]
    for axis in range(3):
        if child_index & (1 << axis):
            c[axis] += 1
    return tuple(c)


def child_face(face, axis, child_index):
    f = [2 * i for i in face]
    if child_index & 1:
        f[(axis + 1) % 3] += 1
    if child_index & 2:
        f[(axis + 2) % 3] += 1
    return tuple(f)


def child_edge(edge, edge_axis, child_index):
    e = [2 * i for i in edge]
    if child_index:
        e[edge_axis] += 1
    return tuple(e)


def child_edge_in_face(face, face_axis, edge_axis, child_index):
    e = [2 * i for i in face]
    if child_index == 1:
        e[edge_axis] += 1
    e[3 - face_axis - edge_axis] += 1
    return tuple(e)


def in_bounds(idx, shape):
    return all(0 <= i < s for i, s in zip(idx, shape))


# ---------------------------------------------------------------------------
# Octree build (HDK_OctreeGrid.cpp:4-243)
# ---------------------------------------------------------------------------

def build_octree(mask, levels):
    res = mask.shape
    labels = [
        np.where(mask == 0, ACTIVE, np.where(mask < 0, UP, INACTIVE)).astype(np.int8)
    ]
    for level in range(1, levels):
        labels.append(np.full(tuple(n >> level for n in res), INACTIVE, np.int8))

    for level in range(levels - 1):
        lab, par = labels[level], labels[level + 1]
        shape = lab.shape

        # pass 1: UP with ACTIVE sibling -> ACTIVE; ACTIVE child -> parent DOWN
        new_lab = lab.copy()
        for cell in np.ndindex(shape):
            if lab[cell] == UP:
                p = parent(cell)
                if any(lab[child_cell(p, ci)] == ACTIVE for ci in range(8)):
                    new_lab[cell] = ACTIVE
        lab = new_lab
        for cell in np.ndindex(shape):
            if lab[cell] == ACTIVE:
                par[parent(cell)] = DOWN

        # pass 2: face grading
        parent_active, parent_down = set(), set()
        for cell in np.ndindex(shape):
            if lab[cell] == ACTIVE:
                for axis in range(3):
                    for direction in (0, 1):
                        adj = cell_to_cell(cell, axis, direction)
                        if not (0 <= adj[axis] < shape[axis]):
                            continue
                        if lab[adj] == UP:
                            parent_active.add(parent(adj))
            elif lab[cell] == DOWN:
                parent_down.add(parent(cell))
        for p in parent_down:
            par[p] = DOWN
        for p in parent_active:
            par[p] = ACTIVE

        # pass 3: UP child with INACTIVE parent -> parent UP
        for cell in np.ndindex(shape):
            if lab[cell] == UP and par[parent(cell)] == INACTIVE:
                par[parent(cell)] = UP

        labels[level] = lab
        labels[level + 1] = par

    labels[-1] = np.where(labels[-1] == UP, ACTIVE, labels[-1]).astype(np.int8)
    return labels


# ---------------------------------------------------------------------------
# Octree invariants (HDK_OctreeGrid.cpp:988-1275)
# ---------------------------------------------------------------------------

def get_face_adjacent_cells(labels, cell, axis, direction, level):
    """HDK_OctreeGrid::getFaceAdjacentCells (cpp:922-978)."""
    out = []
    adj = cell_to_cell(cell, axis, direction)
    lab = labels[level][adj]
    if lab == ACTIVE:
        out.append((adj, level))
    elif lab == UP:
        out.append((parent(adj), level + 1))
    elif lab == DOWN:
        for second in (0, 1):
            for third in (0, 1):
                ci = 0
                if direction == 0:
                    ci += 1 << axis
                if second == 1:
                    ci += 1 << ((axis + 1) % 3)
                if third == 1:
                    ci += 1 << ((axis + 2) % 3)
                child = child_cell(adj, ci)
                if labels[level - 1][child] == ACTIVE:
                    out.append((child, level - 1))
    return out


def check_octree_invariants(labels):
    """Run the three debug unit tests; returns list of failure strings."""
    levels = len(labels)
    fails = []

    # activeCountUnitTest (cpp:988-1080)
    for cell in np.ndindex(labels[0].shape):
        v = labels[0][cell]
        c = cell
        if v == INACTIVE:
            found_down = False
            for level in range(1, levels):
                c = parent(c)
                lab = labels[level][c]
                if lab == DOWN:
                    found_down = True
                elif lab == INACTIVE:
                    if found_down:
                        fails.append(f"inactive column {cell}: INACTIVE above DOWN")
                else:
                    fails.append(f"inactive column {cell}: bad ancestor {lab}")
        elif v == ACTIVE:
            for level in range(1, levels):
                c = parent(c)
                if labels[level][c] != DOWN:
                    fails.append(f"active column {cell}: non-DOWN ancestor")
        elif v == UP:
            found_active = False
            for level in range(1, levels):
                c = parent(c)
                lab = labels[level][c]
                if lab == ACTIVE:
                    if found_active:
                        fails.append(f"up column {cell}: two ACTIVE ancestors")
                    found_active = True
                elif lab == UP:
                    if found_active:
                        fails.append(f"up column {cell}: UP above ACTIVE")
                elif lab == DOWN:
                    if not found_active:
                        fails.append(f"up column {cell}: DOWN below ACTIVE")
                else:
                    fails.append(f"up column {cell}: INACTIVE ancestor")
            if not found_active:
                fails.append(f"up column {cell}: no ACTIVE ancestor")
        else:
            fails.append(f"DOWN at finest level {cell}")
        if fails:
            break

    # upAdjacentUnitTest (cpp:1084-1160)
    for level in range(levels):
        shape = labels[level].shape
        for cell in np.ndindex(shape):
            if labels[level][cell] != UP:
                continue
            p = parent(cell)
            for ci in range(8):
                if labels[level][child_cell(p, ci)] != UP:
                    fails.append(f"UP {cell}@{level} has non-UP sibling")
            for axis in range(3):
                for direction in (0, 1):
                    adj = cell_to_cell(cell, axis, direction)
                    if not (0 <= adj[axis] < shape[axis]):
                        continue
                    if labels[level][adj] not in (ACTIVE, UP):
                        fails.append(f"UP {cell}@{level} bad neighbour")
        if fails:
            return fails

    # activeUnitTest (cpp:1166-1275)
    for level in range(levels):
        shape = labels[level].shape
        for cell in np.ndindex(shape):
            if labels[level][cell] != ACTIVE:
                continue
            for axis in range(3):
                for direction in (0, 1):
                    adj = cell_to_cell(cell, axis, direction)
                    if not (0 <= adj[axis] < shape[axis]):
                        continue
                    adj_list = get_face_adjacent_cells(labels, cell, axis, direction, level)
                    lab = labels[level][adj]
                    if lab == DOWN:
                        if len(adj_list) != 4:
                            fails.append(f"ACTIVE {cell}@{level}: DOWN neighbour != 4 kids")
                        for c2, l2 in adj_list:
                            if labels[l2][c2] != ACTIVE:
                                fails.append(f"ACTIVE {cell}@{level}: grading violated")
                    elif lab == UP:
                        if level == levels - 1 or labels[level + 1][parent(adj)] != ACTIVE:
                            fails.append(f"ACTIVE {cell}@{level}: UP parent not ACTIVE")
                    for c2, l2 in adj_list:
                        rec = get_face_adjacent_cells(labels, c2, axis, 1 - direction, l2)
                        if (cell, level) not in rec:
                            fails.append(f"ACTIVE {cell}@{level}: no reciprocity")
            if fails:
                return fails
    return fails


# ---------------------------------------------------------------------------
# Integration weights (buildIntegrationWeights, cpp:712-791)
# ---------------------------------------------------------------------------

def _trilinear(field, pts):
    """Trilinear sample of a cell-sampled field at index-space points,
    border-clamped — via scipy (independent of the library's shifted-lerp
    formulation)."""
    from scipy.ndimage import map_coordinates

    return map_coordinates(field, pts.T, order=1, mode="nearest")


def volume_fraction(sdf, kind, axis, num_samples, iso_offset=0.0):
    """Fraction of the dual cell with sdf + iso_offset <= 0 (supersampled)."""
    res = sdf.shape
    if kind == "center":
        shape = res
        base = np.zeros(3)
    elif kind == "edge":
        shape = tuple(r + (0 if d == axis else 1) for d, r in enumerate(res))
        base = np.array([0.0 if d == axis else -0.5 for d in range(3)])
    elif kind == "face":
        shape = tuple(r + (1 if d == axis else 0) for d, r in enumerate(res))
        base = np.array([-0.5 if d == axis else 0.0 for d in range(3)])
    else:
        raise ValueError(kind)
    subs = np.array([(i + 0.5) / num_samples - 0.5 for i in range(num_samples)])
    grid = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1).reshape(-1, 3)
    acc = np.zeros(len(grid))
    for ox in subs:
        for oy in subs:
            for oz in subs:
                pts = grid + base + np.array([ox, oy, oz])
                acc += (_trilinear(sdf, pts) + iso_offset <= 0.0)
    return (acc / num_samples ** 3).reshape(shape)


def integration_weights(liquid_sdf, solid_sdf, num_samples, extrapolation, apply_solid):
    center_w = volume_fraction(liquid_sdf, "center", None, num_samples)
    edge_w = [volume_fraction(liquid_sdf, "edge", a, num_samples) for a in range(3)]
    if apply_solid:
        co = volume_fraction(-solid_sdf, "center", None, num_samples, extrapolation)
        center_w = np.where(co > 0, center_w / np.maximum(co, 1e-30), 0.0)
        for a in range(3):
            eo = volume_fraction(-solid_sdf, "edge", a, num_samples, extrapolation)
            edge_w[a] = np.where(eo > 0, edge_w[a] / np.maximum(eo, 1e-30), 0.0)
    return center_w, edge_w


# ---------------------------------------------------------------------------
# DOF classification (cpp:1087-1443).  Solid SDF negative inside the solid.
# ---------------------------------------------------------------------------

def _face_shape(res, axis):
    return tuple(r + (1 if d == axis else 0) for d, r in enumerate(res))


def _edge_shape(res, axis):
    return tuple(r + (0 if d == axis else 1) for d, r in enumerate(res))


def _solid_at_face(solid_sdf, face, axis):
    res = solid_sdf.shape
    b = list(face); b[axis] = max(0, min(res[axis] - 1, b[axis] - 1))
    f = list(face); f[axis] = max(0, min(res[axis] - 1, f[axis]))
    return 0.5 * (solid_sdf[tuple(b)] + solid_sdf[tuple(f)])


def _face_weight_active(center_w, edge_w, face, axis, res):
    back = face_to_cell(face, axis, 0)
    fwd = face_to_cell(face, axis, 1)
    if center_w[back] > 0 or center_w[fwd] > 0:
        return True
    for edge_axis in range(3):
        if edge_axis == axis:
            continue
        for direction in (0, 1):
            e = face_to_edge(face, axis, edge_axis, direction)
            if edge_w[edge_axis][e] > 0:
                return True
    return False


def classify_regular_velocity(center_w, edge_w, solid_sdf, extrapolation, axis):
    res = solid_sdf.shape
    kind = np.full(_face_shape(res, axis), UNASSIGNED, np.int8)
    for face in np.ndindex(kind.shape):
        back = face_to_cell(face, axis, 0)
        fwd = face_to_cell(face, axis, 1)
        if back[axis] < 0 or fwd[axis] >= res[axis]:
            continue
        if _face_weight_active(center_w, edge_w, face, axis, res):
            if _solid_at_face(solid_sdf, face, axis) < extrapolation:
                kind[face] = SOLIDBOUNDARY
            else:
                kind[face] = FLUID
    return kind


def classify_octree_velocity(labels, center_w, edge_w, solid_sdf, extrapolation):
    res = solid_sdf.shape
    out = []
    for level, lab in enumerate(labels):
        per_axis = []
        shape = lab.shape
        for axis in range(3):
            kind = np.full(_face_shape(shape, axis), UNASSIGNED, np.int8)
            for face in np.ndindex(kind.shape):
                back = face_to_cell(face, axis, 0)
                fwd = face_to_cell(face, axis, 1)
                if back[axis] < 0 or fwd[axis] >= shape[axis]:
                    if level == 0:
                        kind[face] = OUTSIDE
                    continue
                bl, fl = lab[back], lab[fwd]
                if level == 0:
                    if bl == ACTIVE and fl == ACTIVE:
                        if _face_weight_active(center_w, edge_w, face, axis, res):
                            if _solid_at_face(solid_sdf, face, axis) < extrapolation:
                                kind[face] = SOLIDBOUNDARY
                            else:
                                kind[face] = FLUID
                        else:
                            kind[face] = OUTSIDE
                    elif bl == INACTIVE or fl == INACTIVE:
                        kind[face] = OUTSIDE
                    elif (bl, fl) in ((UP, ACTIVE), (ACTIVE, UP)):
                        kind[face] = FLUID
                else:
                    if (bl, fl) in ((ACTIVE, ACTIVE), (UP, ACTIVE), (ACTIVE, UP)):
                        kind[face] = FLUID
            per_axis.append(kind)
        out.append(per_axis)
    return out


def classify_edge_stress(labels, edge_w):
    out = []
    for level, lab in enumerate(labels):
        shape = lab.shape
        per_axis = []
        for axis in range(3):
            kind = np.full(_edge_shape(shape, axis), UNASSIGNED, np.int8)
            for edge in np.ndindex(kind.shape):
                is_active = False
                status = None
                for ci in range(4):
                    cell = edge_to_cell(edge, axis, ci)
                    if not in_bounds(cell, shape):
                        status = OUTSIDE
                        break
                    if lab[cell] == DOWN:
                        is_active = False
                        break
                    if lab[cell] == ACTIVE:
                        is_active = True
                if status == OUTSIDE:
                    kind[edge] = OUTSIDE
                elif is_active:
                    if level == 0:
                        kind[edge] = FLUID if edge_w[axis][edge] > 0 else OUTSIDE
                    else:
                        kind[edge] = FLUID
            per_axis.append(kind)
        out.append(per_axis)
    return out


def classify_center_stress(labels, center_w):
    out = []
    for level, lab in enumerate(labels):
        kind = np.full(lab.shape, UNASSIGNED, np.int8)
        for cell in np.ndindex(lab.shape):
            if lab[cell] == ACTIVE and (level != 0 or center_w[cell] > 0):
                kind[cell] = FLUID
        out.append(kind)
    return out


# ---------------------------------------------------------------------------
# DOF indexing (buildRegular/Octree/EdgeStress/CenterStressIndices,
# cpp:1445-1715) — C-order within each (level, axis) grid, level-major.
# ---------------------------------------------------------------------------

def assign_indices(kind_grids):
    out, counter = [], 0
    for k in kind_grids:
        g = k.astype(np.int64).copy()
        flat = g.reshape(-1)
        sel = np.flatnonzero(flat == FLUID)
        flat[sel] = counter + np.arange(len(sel))
        counter += len(sel)
        out.append(flat.reshape(k.shape))
    return out, counter


def index_pyramid(vel_kinds):
    """[level][axis] kind grids -> index grids + total (level-major, axis)."""
    flat = [vel_kinds[l][a] for l in range(len(vel_kinds)) for a in range(3)]
    grids, total = assign_indices(flat)
    out = [[grids[3 * l + a] for a in range(3)] for l in range(len(vel_kinds))]
    return out, total


# ---------------------------------------------------------------------------
# Stress stencil rows (getEdgeStressFaces cpp:1717-1908,
# getCenterStressFaces cpp:1910-1963) and control volumes (cpp:1965-2057).
# ---------------------------------------------------------------------------

def _solid_component_at_face(solid_vel, comp_axis, face_axis, face):
    """MAC component ``comp_axis`` interpolated at the center of a level-0
    ``face_axis`` face: the clamped 4-sample mean (== world trilinear for
    aligned MAC grids, the reference's solidVelocity.getField(axis)->getValue
    at the face-center point, cpp:1898-1901)."""
    sv = solid_vel[comp_axis]
    res = tuple(s - (1 if d == comp_axis else 0) for d, s in enumerate(sv.shape))

    def cell_val(cell):
        c = tuple(min(max(cell[d], 0), res[d] - 1) for d in range(3))
        lo = list(c)
        hi = list(c)
        hi[comp_axis] += 1
        return 0.5 * (sv[tuple(lo)] + sv[tuple(hi)])

    lo = list(face)
    lo[face_axis] -= 1
    return 0.5 * (cell_val(tuple(lo)) + cell_val(tuple(face)))


def edge_stress_row(edge, level, axis, vel_idx, labels, solid_vel, dx, use_enhanced,
                    compat_edge_boundary=False):
    """Returns ([(vel_dof, coeff)], [boundary rhs values]).

    ``compat_edge_boundary``: replicate the reference's solid-boundary RHS
    exactly (cpp:1896-1905) — sample the *edge-axis* component of the solid
    velocity at the face center instead of the face-axis component.
    """
    levels = len(labels)
    res = labels[level].shape
    dxw = dx * (1 << level)
    grad_dx = [0.0, 0.0, 0.0]
    at_transition = [False] * 3
    face_outside = [False] * 3

    def fshape(f):
        return _face_shape(res, f)

    for f in range(3):
        if f == axis:
            continue
        g = 3 - f - axis
        for d in (0, 1):
            face = edge_to_face(edge, axis, f, d)
            if face[g] < 0 or face[g] >= fshape(f)[g]:
                grad_dx[g] += 0.5 * dxw
                face_outside[g] = True
                continue
            vi = vel_idx[level][f][face]
            if vi >= 0:
                grad_dx[g] += 0.5 * dxw
            elif vi in (OUTSIDE, SOLIDBOUNDARY):
                grad_dx[g] += 0.5 * dxw
                face_outside[g] = True
            elif vi == UNASSIGNED:
                grad_dx[g] += dxw
                if use_enhanced:
                    at_transition[g] = True

    entries, boundary = [], []
    for f in range(3):
        if f == axis:
            continue
        g = 3 - f - axis
        for d in (0, 1):
            face = edge_to_face(edge, axis, f, d)
            sign = -1.0 if d == 0 else 1.0
            if face[g] < 0 or face[g] >= fshape(f)[g]:
                continue
            vi = vel_idx[level][f][face]
            if vi >= 0:
                if at_transition[g] and not face_outside[g]:
                    sib = list(face)
                    sib[axis] += 1 if edge[axis] % 2 == 0 else -1
                    svi = vel_idx[level][f][tuple(sib)]
                    assert svi >= 0
                    entries.append((svi, 0.25 * sign / grad_dx[g]))
                    entries.append((vi, 0.25 * sign / grad_dx[g]))
                else:
                    entries.append((vi, 0.5 * sign / grad_dx[g]))
            elif vi == UNASSIGNED:
                if edge[f] % 2 != 0:  # dangling edge
                    for o in (-1, 1):
                        of = list(face)
                        of[f] += o
                        pf = parent(of)
                        pvi = vel_idx[level + 1][f][pf]
                        if pvi >= 0:
                            entries.append((pvi, 0.25 * sign / grad_dx[g]))
                        elif pvi == UNASSIGNED:
                            for ci in range(4):
                                cf = child_face(pf, f, ci)
                                cvi = vel_idx[level][f][cf]
                                assert cvi >= 0
                                entries.append((cvi, 0.0625 * sign / grad_dx[g]))
                        else:
                            assert pvi != SOLIDBOUNDARY
                else:
                    pf = parent(face)
                    pvi = vel_idx[level + 1][f][pf]
                    assert pvi >= 0
                    entries.append((pvi, 0.5 * sign / grad_dx[g]))
            elif vi == SOLIDBOUNDARY:
                assert level == 0
                # The reference samples the EDGE-AXIS component at the face
                # center (cpp:1901); the library default uses the face-axis
                # component (see stencils.py).  Both transcribed here.
                if compat_edge_boundary:
                    sv = _solid_component_at_face(solid_vel, axis, f, face)
                else:
                    sv = solid_vel[f][face]
                boundary.append(0.5 * sign * sv / grad_dx[g])
    return entries, boundary


def center_stress_row(cell, level, axis, vel_idx, labels, solid_vel, dx):
    dxw = dx * (1 << level)
    entries, boundary = [], []
    for d in (0, 1):
        face = cell_to_face(cell, axis, d)
        sign = -1.0 if d == 0 else 1.0
        vi = vel_idx[level][axis][face]
        if vi >= 0:
            entries.append((vi, sign / dxw))
        elif vi == UNASSIGNED:
            assert level > 0
            for ci in range(4):
                cf = child_face(face, axis, ci)
                cvi = vel_idx[level - 1][axis][cf]
                assert cvi >= 0
                entries.append((cvi, 0.25 * sign / dxw))
        elif vi == SOLIDBOUNDARY:
            assert level == 0
            boundary.append(sign * solid_vel[axis][face] / dxw)
    return entries, boundary


def edge_volume(edge, level, axis, vel_idx, labels):
    """edgeOctreeVolumes (cpp:2004-2057), finest-cell index units."""
    res = labels[level].shape
    dxi = float(1 << level)
    vdx = [0.0, 0.0, 0.0]
    vdx[axis] = dxi
    for f in range(3):
        if f == axis:
            continue
        g = 3 - f - axis
        for d in (0, 1):
            face = edge_to_face(edge, axis, f, d)
            if face[g] < 0 or face[g] >= _face_shape(res, f)[g]:
                vdx[g] += 0.5 * dxi
            else:
                vi = vel_idx[level][f][face]
                if vi == UNASSIGNED:
                    vdx[g] += dxi
                else:
                    vdx[g] += 0.5 * dxi
    return vdx[0] * vdx[1] * vdx[2]


def face_volume(face, level, axis, labels):
    """faceOctreeVolumes (cpp:1965-2002), finest-cell index units."""
    res = labels[level].shape
    dxi = float(1 << level)
    gdx = 0.0
    for d in (0, 1):
        cell = face_to_cell(face, axis, d)
        if cell[axis] < 0 or cell[axis] >= res[axis]:
            gdx += 0.5 * dxi
        elif labels[level][cell] in (ACTIVE, INACTIVE):
            gdx += 0.5 * dxi
        else:
            assert labels[level][cell] == UP
            gdx += dxi
    return dxi * dxi * gdx


def sample_cell_field(field, pos):
    """Clamped trilinear sample at fine-cell index coords (getValue)."""
    from scipy.ndimage import map_coordinates

    return float(map_coordinates(field, np.array(pos)[:, None], order=1, mode="nearest")[0])


def edge_center_pos(edge, level, axis):
    s = 1 << level
    return [s * (edge[d] + 0.5) - 0.5 if d == axis else s * edge[d] - 0.5 for d in range(3)]


def cell_center_pos(cell, level):
    s = 1 << level
    return [s * (cell[d] + 0.5) - 0.5 for d in range(3)]


def face_center_pos(face, level, axis):
    s = 1 << level
    return [s * face[d] - 0.5 if d == axis else s * (face[d] + 0.5) - 0.5 for d in range(3)]


# ---------------------------------------------------------------------------
# Full system assembly — both forms:
#   variational:  A = M + D^T W D          (the stated system, cpp:424)
#   enumerated:   per-velocity-DOF walk    (buildOctreeSystemFromStencils,
#                                           cpp:2459-2777)
# ---------------------------------------------------------------------------

def build_rows_data(labels, vel_idx, edge_idx, center_idx, edge_w0, center_w0,
                    viscosity, solid_vel, dt, dx, use_enhanced,
                    compat_edge_boundary=False):
    """Per-stress-DOF stencil rows + weights, keyed by (level, pos, axis)."""
    levels = len(labels)
    edge_rows, center_rows = {}, {}
    for level in range(levels):
        for axis in range(3):
            grid = edge_idx[level][axis]
            for e in zip(*np.nonzero(grid >= 0)):
                entries, bnd = edge_stress_row(
                    e, level, axis, vel_idx, labels, solid_vel, dx, use_enhanced,
                    compat_edge_boundary=compat_edge_boundary,
                )
                vol = edge_volume(e, level, axis, vel_idx, labels)
                if level == 0:
                    # float() guards against numpy-2.0 weak promotion pinning
                    # the whole row weight to float32
                    w0 = float(edge_w0[axis][e])
                    vol = vol if w0 == 1.0 else w0
                visc = sample_cell_field(viscosity, edge_center_pos(e, level, axis))
                edge_rows[(level, e, axis)] = (entries, bnd, 4.0 * dt * vol * visc)
    for level in range(levels):
        grid = center_idx[level]
        for cell in zip(*np.nonzero(grid >= 0)):
            if level == 0:
                vol = float(center_w0[cell])
            else:
                vol = float(1 << level) ** 3
            visc = sample_cell_field(viscosity, cell_center_pos(cell, level))
            for axis in range(3):
                entries, bnd = center_stress_row(
                    cell, level, axis, vel_idx, labels, solid_vel, dx
                )
                center_rows[(level, cell, axis)] = (entries, bnd, 2.0 * dt * vol * visc)
    return edge_rows, center_rows


def build_D_W_b(edge_rows, center_rows, n_vel):
    """Stack all stress rows into sparse D, weight diag W, boundary vector b."""
    import scipy.sparse as sp

    n_rows = len(edge_rows) + len(center_rows)
    D = sp.lil_matrix((n_rows, n_vel))
    W = np.zeros(n_rows)
    b = np.zeros(n_rows)
    for row, (entries, bnd, w) in enumerate(
        list(edge_rows.values()) + list(center_rows.values())
    ):
        for col, c in entries:
            D[row, col] += c
        b[row] += sum(bnd)
        W[row] = w
    return D.tocsr(), W, b


def build_mass(labels, vel_idx, face_w0, density, n_vel):
    m = np.zeros(n_vel)
    for level in range(len(labels)):
        for axis in range(3):
            grid = vel_idx[level][axis]
            for face in zip(*np.nonzero(grid >= 0)):
                vol = face_volume(face, level, axis, labels)
                if level == 0:
                    w0 = float(face_w0[axis][face])
                    vol = vol if w0 == 1.0 else w0
                rho = sample_cell_field(density, face_center_pos(face, level, axis))
                m[int(grid[face])] = vol * rho
    return m


def restrict_velocity(face, level, axis, regular_velocity):
    """Full-weighting restriction of the fine velocity to an octree face
    (buildVelocityMappingPartial BFS, cpp:2291-2402). Out-of-range fine reads
    are zero (cannot occur for interior coarse DOFs)."""
    w_in = (1.0 / 16.0, 1.0 / 8.0, 1.0 / 16.0)
    total = 0.0
    queue = [(face, 1.0, level)]
    while queue:
        f, w, l = queue.pop()
        if l == 0:
            if in_bounds(f, regular_velocity.shape):
                total += w * regular_velocity[f]
        else:
            for ci in range(4):
                cf = child_face(f, axis, ci)
                for o in (-1, 0, 1):
                    af = list(cf)
                    af[axis] += o
                    queue.append((tuple(af), w * w_in[o + 1], l - 1))
    return total


def build_guess(labels, vel_idx, regular_velocity, n_vel):
    g = np.zeros(n_vel)
    for level in range(len(labels)):
        for axis in range(3):
            grid = vel_idx[level][axis]
            for face in zip(*np.nonzero(grid >= 0)):
                g[int(grid[face])] = restrict_velocity(
                    face, level, axis, regular_velocity[axis]
                )
    return g


def assemble_variational(D, W, b, mass, guess):
    import scipy.sparse as sp

    A = sp.diags(mass) + D.T @ sp.diags(W) @ D
    rhs = mass * guess - D.T @ (W * b)
    return A.tocsr(), rhs


def assemble_enumerated(labels, vel_idx, edge_idx, center_idx, n_vel,
                        edge_rows_data, center_rows_data, mass, guess,
                        use_enhanced):
    """Transcription of buildOctreeSystemFromStencilsPartial (cpp:2459-2777):
    per velocity DOF, gather the stress stencils that reference it.

    ``edge_rows_data``/``center_rows_data``: row -> (entries, boundary, weight)
    keyed like build_D_W_b's rows.
    """
    import scipy.sparse as sp

    levels = len(labels)
    A = sp.lil_matrix((n_vel, n_vel))
    rhs = np.zeros(n_vel)

    def apply_to_matrix(vidx, coeff_w, entries, boundary, diag_acc):
        self_c = None
        for col, c in entries:
            if col == vidx:
                self_c = c if self_c is None else self_c + c
        assert self_c is not None, "stencil does not reference the DOF"
        coeff = coeff_w * self_c
        d = 0.0
        for col, c in entries:
            el = coeff * c
            if col == vidx:
                d += el
            else:
                A[vidx, col] += el
        for bv in boundary:
            rhs[vidx] -= coeff * bv
        return diag_acc + d

    for level in range(levels):
        res = labels[level].shape
        for axis in range(3):
            grid = vel_idx[level][axis]
            fshape = grid.shape
            for face in zip(*np.nonzero(grid >= 0)):
                vidx = int(grid[face])
                diag = 0.0
                for d in (0, 1):
                    cell = face_to_cell(face, axis, d)
                    if cell[axis] < 0 or cell[axis] >= res[axis]:
                        continue
                    if labels[level][cell] == ACTIVE:
                        scell, slevel = cell, level
                    else:
                        scell, slevel = parent(cell), level + 1
                    ci = center_idx[slevel][scell]
                    if ci >= 0:
                        entries, bnd, w = center_rows_data[(slevel, scell, axis)]
                        diag = apply_to_matrix(vidx, w, entries, bnd, diag)
                    # T-junction inset edge stresses (cpp:2609-2649)
                    for fa in range(3):
                        if fa == axis:
                            continue
                        for fd in (0, 1):
                            af = cell_to_face(scell, fa, fd)
                            if vel_idx[slevel][fa][af] == UNASSIGNED:
                                ea = 3 - fa - axis
                                for ie in (0, 1):
                                    edge = child_edge_in_face(af, fa, ea, ie)
                                    eidx = edge_idx[slevel - 1][ea][edge]
                                    if eidx >= 0:
                                        entries, bnd, w = edge_rows_data[
                                            (slevel - 1, edge, ea)
                                        ]
                                        diag = apply_to_matrix(vidx, w, entries, bnd, diag)
                for ea in range(3):
                    if ea == axis:
                        continue
                    for d in (0, 1):
                        edge = face_to_edge(face, axis, ea, d)
                        eidx = edge_idx[level][ea][edge]
                        if eidx >= 0:
                            if use_enhanced:
                                ta = 3 - ea - axis
                                af = list(face)
                                af[ta] += -1 if d == 0 else 1
                                af = tuple(af)
                                if 0 <= af[ta] < fshape[ta]:
                                    if vel_idx[level][axis][af] == UNASSIGNED:
                                        sib = list(edge)
                                        sib[ea] += 1 if edge[ea] % 2 == 0 else -1
                                        sib = tuple(sib)
                                        assert edge_idx[level][ea][sib] >= 0
                                        entries, bnd, w = edge_rows_data[(level, sib, ea)]
                                        diag = apply_to_matrix(vidx, w, entries, bnd, diag)
                            entries, bnd, w = edge_rows_data[(level, edge, ea)]
                            diag = apply_to_matrix(vidx, w, entries, bnd, diag)
                        elif eidx == UNASSIGNED:
                            assert level > 0
                            for ci2 in (0, 1):
                                ce = child_edge(edge, ea, ci2)
                                ceidx = edge_idx[level - 1][ea][ce]
                                if ceidx >= 0:
                                    entries, bnd, w = edge_rows_data[(level - 1, ce, ea)]
                                    diag = apply_to_matrix(vidx, w, entries, bnd, diag)
                A[vidx, vidx] += mass[vidx] + diag
                rhs[vidx] += mass[vidx] * guess[vidx]
    return A.tocsr(), rhs


# ---------------------------------------------------------------------------
# T-junction interpolator (HDK_OctreeVectorFieldInterpolator.cpp) — loop
# transcription for testing the dense implementation.
# ---------------------------------------------------------------------------

INACTIVE_NODE, ACTIVE_NODE, DEPENDENT_NODE = 0, 1, 2


def _node_shape(res):
    return tuple(r + 1 for r in res)


class OracleInterpolator:
    def __init__(self, labels, u, vel_idx):
        """u: {(level, axis): face array}; vel_idx: index grids (sentinels)."""
        self.labels = labels
        self.u = u
        self.vel_idx = vel_idx
        self.levels = len(labels)
        L = self.levels
        self.node_label = [np.zeros(_node_shape(l.shape), np.int8) for l in labels]
        self.node_vals = [
            [np.zeros(_node_shape(l.shape)) for _ in range(3)] for l in labels
        ]
        node_wts = [
            [np.zeros(_node_shape(l.shape)) for _ in range(3)] for l in labels
        ]
        flags = [np.zeros(_node_shape(l.shape), np.int64) for l in labels]

        # setActiveNodes (cpp:118-188)
        for level in range(L):
            for node in np.ndindex(self.node_label[level].shape):
                is_active = False
                is_inactive = False
                for f in range(3):
                    if is_inactive:
                        break
                    fshape = vel_idx[level][f].shape
                    for fi in range(4):
                        face = node_to_face(node, f, fi)
                        t1, t2 = (f + 1) % 3, (f + 2) % 3
                        if (face[t1] < 0 or face[t2] < 0 or
                                face[t1] >= fshape[t1] or face[t2] >= fshape[t2]):
                            is_inactive = True
                            continue
                        vi = vel_idx[level][f][face]
                        if vi >= 0:
                            is_active = True
                        elif vi in (SOLIDBOUNDARY, OUTSIDE):
                            is_inactive = True
                            break
                if is_active and not is_inactive:
                    self.node_label[level][node] = ACTIVE_NODE

        # sampleActiveNodes (cpp:190-286)
        for level in range(L):
            w = float(1 << (L - level - 1))
            for node in np.ndindex(self.node_label[level].shape):
                if self.node_label[level][node] != ACTIVE_NODE:
                    continue
                flag = 0
                for f in range(3):
                    fshape = vel_idx[level][f].shape
                    acc_v, acc_w = 0.0, 0.0
                    for fi in range(4):
                        face = node_to_face(node, f, fi)
                        t1, t2 = (f + 1) % 3, (f + 2) % 3
                        if (face[t1] < 0 or face[t2] < 0 or
                                face[t1] >= fshape[t1] or face[t2] >= fshape[t2]):
                            flag += 1 << (f * 4 + fi)
                            acc_w += w
                            continue
                        vi = vel_idx[level][f][face]
                        if vi >= 0:
                            acc_v += w * u[(level, f)][face]
                            acc_w += w
                            flag += 1 << (f * 4 + fi)
                        elif vi != UNASSIGNED:
                            acc_w += w
                            flag += 1 << (f * 4 + fi)
                    self.node_vals[level][f][node] = acc_v
                    node_wts[level][f][node] = acc_w
                flags[level][node] = flag

        # bubbleActiveNodeValues (cpp:288-355)
        for level in range(L - 1):
            for node in np.ndindex(self.node_label[level].shape):
                if self.node_label[level][node] != ACTIVE_NODE:
                    continue
                if any(n % 2 for n in node):
                    continue
                pnode = parent(node)
                if self.node_label[level + 1][pnode] == ACTIVE_NODE:
                    flags[level + 1][pnode] += flags[level][node]
                    for f in range(3):
                        node_wts[level + 1][f][pnode] += node_wts[level][f][node]
                        self.node_vals[level + 1][f][pnode] += self.node_vals[level][f][node]
                    self.node_label[level][node] = DEPENDENT_NODE

        # finishIncompleteNodes (cpp:357-567)
        for level in range(L - 1):
            w = float(1 << (L - level - 1))
            for node in np.ndindex(self.node_label[level].shape):
                if self.node_label[level][node] != ACTIVE_NODE:
                    continue
                flag = flags[level][node]
                if flag == 0xFFF:
                    continue
                for bitshift in range(12):
                    if flag & (1 << bitshift):
                        continue
                    f = bitshift // 4
                    fi = bitshift % 4
                    done = False
                    if node[f] % 2 == 0:
                        face = node_to_face(node, f, fi)
                        pf = parent(face)
                        vi = vel_idx[level + 1][f][pf]
                        if vi >= 0:
                            self.node_vals[level][f][node] += w * u[(level + 1, f)][pf]
                            node_wts[level][f][node] += w
                            flag += 1 << bitshift
                            done = True
                    if not done:
                        assert node[f] % 2 != 0
                        face = node_to_face(node, f, fi)
                        cell = face_to_cell(face, f, 1)
                        sl = level
                        while labels[sl][tuple(c >> (sl - level) for c in cell)] != ACTIVE:
                            sl += 1
                            assert sl < L
                        d = sl - level
                        scell = tuple(c >> d for c in cell)
                        t = (face[f] % (1 << d)) / float(1 << d)
                        ghost = 0.0
                        for direction in (0, 1):
                            of = cell_to_face(scell, f, direction)
                            ovi = vel_idx[sl][f][of]
                            lw = (1.0 - t) if direction == 0 else t
                            if ovi >= 0:
                                ghost += lw * u[(sl, f)][of]
                            elif ovi == UNASSIGNED:
                                for ci in range(4):
                                    cf = child_face(of, f, ci)
                                    cvi = vel_idx[sl - 1][f][cf]
                                    assert cvi >= 0
                                    ghost += 0.25 * lw * u[(sl - 1, f)][cf]
                        self.node_vals[level][f][node] += w * ghost
                        node_wts[level][f][node] += w
                        flag += 1 << bitshift
                flags[level][node] = flag
                assert flag == 0xFFF

        # normalizeActiveNodes (cpp:569-613)
        for level in range(L):
            for node in np.ndindex(self.node_label[level].shape):
                if self.node_label[level][node] == ACTIVE_NODE:
                    for f in range(3):
                        assert node_wts[level][f][node] > 0
                        self.node_vals[level][f][node] /= node_wts[level][f][node]

        # distributeNodeValuesDown (cpp:615-658)
        for level in range(L - 2, -1, -1):
            for node in np.ndindex(self.node_label[level].shape):
                if self.node_label[level][node] == DEPENDENT_NODE:
                    pnode = parent(node)
                    assert self.node_label[level + 1][pnode] == ACTIVE_NODE
                    for f in range(3):
                        self.node_vals[level][f][node] = self.node_vals[level + 1][f][pnode]
                    self.node_label[level][node] = ACTIVE_NODE

    def interp(self, pos, axis):
        """interpSPGrid (cpp:660-845).  pos in fine-cell index units
        (cell centers at i + 0.5 -> node grid coords = pos itself)."""
        labels, u, vel_idx = self.labels, self.u, self.vel_idx
        L = self.levels
        cell = tuple(int(np.floor(p)) for p in pos)
        for level in range(L):
            h = 1 << level
            if labels[level][cell] == ACTIVE:
                # posToIndex in the face grid: in-axis coordinate is pos/h,
                # transverse pos/h - 0.5
                face_pt = [
                    pos[d] / h if d == axis else pos[d] / h - 0.5 for d in range(3)
                ]
                bf = tuple(int(np.floor(c)) for c in face_pt)
                at_transition = False
                for fi in range(8):
                    nb = cell_to_node(bf, fi)
                    if in_bounds(nb, vel_idx[level][axis].shape) and \
                            vel_idx[level][axis][nb] == UNASSIGNED:
                        at_transition = True
                        break
                if not at_transition:
                    val = 0.0
                    fr = [np.clip(face_pt[d] - bf[d], 0.0, 1.0) for d in range(3)]
                    for fi in range(8):
                        nb = cell_to_node(bf, fi)
                        w = 1.0
                        for d in range(3):
                            w *= fr[d] if nb[d] != bf[d] else 1.0 - fr[d]
                        uv = u[(level, axis)][nb] if in_bounds(nb, u[(level, axis)].shape) else 0.0
                        val += w * uv
                    return val
                # node path
                t_cell = np.clip(pos[axis] / h - cell[axis], 0.0, 1.0)
                t_axes = [d for d in range(3) if d != axis]
                lcell = cell
                vals = [0.0, 0.0]
                for direction in (0, 1):
                    af = cell_to_face(lcell, axis, direction)
                    fl = level
                    vi = vel_idx[level][axis][af]
                    if vi == UNASSIGNED:
                        child_pt = [pos[d] / (1 << (level - 1)) for d in range(3)]
                        for ci in range(4):
                            cf = child_face(af, axis, ci)
                            ok = all(
                                cf[t] <= child_pt[t] <= cf[t] + 1 for t in t_axes
                            )
                            if ok:
                                af = cf
                                fl = level - 1
                                break
                        assert fl == level - 1
                    hh = 1 << fl
                    fw = [((pos[t] / hh) - np.floor(pos[t] / hh)) for t in t_axes]
                    face_u = self.u[(fl, axis)][af]
                    bil, avg = 0.0, 0.0
                    for ni in range(4):
                        nd = face_to_node(af, axis, ni)
                        nv = self.node_vals[fl][axis][nd]
                        w = 1.0
                        for k, t in enumerate(t_axes):
                            w *= fw[k] if nd[t] != af[t] else 1.0 - fw[k]
                        bil += w * nv
                        avg += nv
                    bump = 2.0 * (face_u - 0.25 * avg) * min(
                        fw[0], fw[1], 1.0 - fw[0], 1.0 - fw[1]
                    )
                    vals[direction] = bil + bump
                return (1.0 - t_cell) * vals[0] + t_cell * vals[1]
            cell = parent(cell)
        raise AssertionError("no active cell found")


# ---------------------------------------------------------------------------
# DOF-layout invariants (debug unit tests, cpp:2896-3298)
# ---------------------------------------------------------------------------

def check_dof_invariants(labels, vel_idx, edge_idx, center_idx):
    """The reference's three debug DOF tests; returns failure strings."""
    fails = []
    levels = len(labels)

    # octreeVelocityUnitTest (cpp:2896-2999): indexed faces sit between
    # ACTIVE/ACTIVE or ACTIVE/UP-with-ACTIVE-parent; sentinels only at level 0
    for level in range(levels):
        res = labels[level].shape
        for axis in range(3):
            grid = vel_idx[level][axis]
            for face in zip(*np.nonzero(grid != UNASSIGNED)):
                vi = grid[face]
                if vi >= 0:
                    back = face_to_cell(face, axis, 0)
                    fwd = face_to_cell(face, axis, 1)
                    bl, fl = labels[level][back], labels[level][fwd]
                    if (bl, fl) == (ACTIVE, UP) or (bl, fl) == (UP, ACTIVE):
                        upc = fwd if fl == UP else back
                        if level == levels - 1 or \
                                labels[level + 1][parent(upc)] != ACTIVE:
                            fails.append(f"vel grading {level}/{axis}/{face}")
                    elif (bl, fl) != (ACTIVE, ACTIVE):
                        fails.append(f"vel labels {level}/{axis}/{face}")
                elif vi in (OUTSIDE, SOLIDBOUNDARY) and level != 0:
                    fails.append(f"vel sentinel at coarse {level}/{axis}/{face}")
    if fails:
        return fails

    # edgeStressUnitTest (cpp:3001-3149): active edges see at most two levels
    for level in range(levels):
        res = labels[level].shape
        for axis in range(3):
            grid = edge_idx[level][axis]
            for edge in zip(*np.nonzero(grid >= 0)):
                for ci in range(4):
                    cell = edge_to_cell(edge, axis, ci)
                    if not in_bounds(cell, res):
                        break
                    if labels[level][cell] in (DOWN, INACTIVE):
                        fails.append(f"edge cell label {level}/{axis}/{edge}")
                for f in range(3):
                    if f == axis:
                        continue
                    g = 3 - f - axis
                    for d in (0, 1):
                        face = edge_to_face(edge, axis, f, d)
                        if face[g] < 0 or face[g] >= _face_shape(res, f)[g]:
                            continue
                        vi = vel_idx[level][f][face]
                        if vi >= 0:
                            continue
                        if vi in (SOLIDBOUNDARY, OUTSIDE):
                            if level != 0:
                                fails.append(f"edge sentinel {level}/{axis}/{edge}")
                        elif vi == UNASSIGNED:
                            if edge[f] % 2 != 0:
                                pc = parent(face)
                                if level == levels - 1 or \
                                        labels[level + 1][pc] != ACTIVE:
                                    fails.append(
                                        f"edge dangling {level}/{axis}/{edge}")
                            else:
                                pf = parent(face)
                                if level == levels - 1 or \
                                        vel_idx[level + 1][f][pf] == UNASSIGNED:
                                    fails.append(
                                        f"edge parent {level}/{axis}/{edge}")
                        else:
                            fails.append(f"edge face {level}/{axis}/{edge}")
    if fails:
        return fails

    # centerStresUnitTest (cpp:3151-3298): active cells have fully-covered
    # face/edge closures down to two child levels
    for level in range(levels):
        grid = center_idx[level]
        for cell in zip(*np.nonzero(grid >= 0)):
            if labels[level][cell] != ACTIVE:
                fails.append(f"center not active {level}/{cell}")
            for axis in range(3):
                for d in (0, 1):
                    face = cell_to_face(cell, axis, d)
                    vi = vel_idx[level][axis][face]
                    if vi == UNASSIGNED:
                        if level == 0:
                            fails.append(f"center unassigned@0 {cell}")
                            continue
                        for ci in range(4):
                            cf = child_face(face, axis, ci)
                            if vel_idx[level - 1][axis][cf] < 0:
                                fails.append(f"center child face {level}/{cell}")
                    elif vi in (OUTSIDE, SOLIDBOUNDARY):
                        if level != 0:
                            fails.append(f"center sentinel {level}/{cell}")
                    elif vi < 0:
                        fails.append(f"center face {level}/{cell}")
            for axis in range(3):
                for ei in range(4):
                    edge = cell_to_edge(cell, axis, ei)
                    si = edge_idx[level][axis][edge]
                    if si == UNASSIGNED:
                        for ci in range(2):
                            ce = child_edge(edge, axis, ci)
                            csi = edge_idx[level - 1][axis][ce]
                            if csi < 0:
                                for gi in range(2):
                                    ge = child_edge(ce, axis, gi)
                                    if edge_idx[level - 2][axis][ge] < 0:
                                        fails.append(
                                            f"center edge closure {level}/{cell}")
    return fails
