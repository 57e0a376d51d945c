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
