"""Staggered-grid topology algebra (vectorized).

The explicit index maps between MAC-grid elements — cells, faces, edges,
nodes — mirroring the reference's header-only free functions
(/root/reference/Source/HDK_Utilities.h:46-217).  The solver itself uses
dense shifted reads, but the maps are part of the public surface: they let
users (and tests) reason about individual DOFs, and they document the
bit-coded child/corner conventions every module follows.

All functions take integer index arrays of shape (..., 3) and are usable
inside jit.  Conventions:

* ``cell_to_face(cell, axis, d)``: face d=0 is the backward face (same
  index), d=1 the forward one (+1 along axis).
* ``cell_to_edge(cell, edge_axis, i)``: i is a 2-bit code offsetting the
  two transverse axes (ordered (edge_axis+1)%3, (edge_axis+2)%3).
* ``cell_to_node(cell, i)``: i is a 3-bit corner code (+1 per set axis bit).
* ``edge_to_cell(edge, edge_axis, i)`` / ``node_to_face`` / ``node_to_cell``:
  inverse maps; unset bits step backward.
* parent/child maps use index>>1 / 2*index+offset (HDK_OctreeGrid.h:53-142).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unit(axis):
    return jnp.eye(3, dtype=jnp.int32)[axis]


def cell_to_cell(cell, axis, direction):
    return cell + jnp.where(direction == 1, 1, -1) * _unit(axis)


def cell_to_face(cell, axis, direction):
    return cell + direction * _unit(axis)


def face_to_cell(face, axis, direction):
    return face - (1 - direction) * _unit(axis)


def cell_to_edge(cell, edge_axis, edge_index):
    t1, t2 = (edge_axis + 1) % 3, (edge_axis + 2) % 3
    return cell + (edge_index & 1) * _unit(t1) + ((edge_index >> 1) & 1) * _unit(t2)


def edge_to_cell(edge, edge_axis, cell_index):
    t1, t2 = (edge_axis + 1) % 3, (edge_axis + 2) % 3
    return edge - (1 - (cell_index & 1)) * _unit(t1) - (1 - ((cell_index >> 1) & 1)) * _unit(t2)


def cell_to_node(cell, node_index):
    off = jnp.array([(node_index >> a) & 1 for a in range(3)], jnp.int32)
    return cell + off


def node_to_cell(node, cell_index):
    off = jnp.array([1 - ((cell_index >> a) & 1) for a in range(3)], jnp.int32)
    return node - off


def face_to_edge(face, face_axis, edge_axis, direction):
    return face + direction * _unit(3 - face_axis - edge_axis)


def edge_to_face(edge, edge_axis, face_axis, direction):
    return edge - (1 - direction) * _unit(3 - face_axis - edge_axis)


def face_to_node(face, face_axis, node_index):
    t1, t2 = (face_axis + 1) % 3, (face_axis + 2) % 3
    return face + (node_index & 1) * _unit(t1) + ((node_index >> 1) & 1) * _unit(t2)


def node_to_face(node, face_axis, face_index):
    t1, t2 = (face_axis + 1) % 3, (face_axis + 2) % 3
    return node - (1 - (face_index & 1)) * _unit(t1) - (1 - ((face_index >> 1) & 1)) * _unit(t2)


# --- inter-level maps (HDK_OctreeGrid.h:53-142) ---


def parent(index):
    return index >> 1


def child_cell(cell, child_index):
    off = jnp.array([(child_index >> a) & 1 for a in range(3)], jnp.int32)
    return 2 * cell + off


def child_face(face, axis, child_index):
    t1, t2 = (axis + 1) % 3, (axis + 2) % 3
    return 2 * face + (child_index & 1) * _unit(t1) + ((child_index >> 1) & 1) * _unit(t2)


def child_edge(edge, edge_axis, child_index):
    return 2 * edge + child_index * _unit(edge_axis)


def child_node(node):
    return 2 * node


def child_edge_in_face(face, face_axis, edge_axis, child_index):
    """Edges inset in a coarse face one level down (HDK_OctreeGrid.h:126-142)."""
    return (
        2 * face
        + child_index * _unit(edge_axis)
        + _unit(3 - face_axis - edge_axis)
    )
