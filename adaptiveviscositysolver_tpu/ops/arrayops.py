"""Dense pyramid array primitives.

The reference walks tiled voxel grids cell-by-cell with fork-join threads
(HDK_OctreeGrid.cpp:395-565 and friends).  The TPU-native equivalent operates
on whole dense per-level arrays: every neighbour access becomes a shifted
read, every parent/child access a strided (factor-2) read or reduce.  These
helpers are the complete vocabulary the solver needs:

* ``shift``          — neighbour reads with explicit out-of-bounds fill
* ``upread``         — read a coarse array at ``index >> 1`` (nearest upsample)
* ``down_any/all``   — 2x2x2 child reductions for cell grids
* ``face_child_mean/sum`` — the 4-child average of a coarse face
                       (HDK_OctreeGrid.h:94-106 getChildFace)
* ``block2_sum/mean``— aligned 2x2 reductions in a subset of axes

All are pure XLA (pad / slice / reshape) so they fuse and shard cleanly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def shift(arr: jnp.ndarray, axis: int, offset: int, fill=0):
    """Return ``out[i] = arr[i + offset]`` along ``axis``; OOB reads ``fill``.

    ``offset=+1`` reads the forward neighbour, ``-1`` the backward one.
    """
    if offset == 0:
        return arr
    n = arr.shape[axis]
    pad = [(0, 0)] * arr.ndim
    if offset > 0:
        pad[axis] = (0, offset)
        padded = jnp.pad(arr, pad, constant_values=fill)
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(offset, offset + n)
    else:
        pad[axis] = (-offset, 0)
        padded = jnp.pad(arr, pad, constant_values=fill)
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(0, n)
    return padded[tuple(idx)]


def grow(arr: jnp.ndarray, axis: int, lo: int = 0, hi: int = 0, fill=0):
    """Pad an array with ``fill`` entries at the low/high end of ``axis``."""
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(arr, pad, constant_values=fill)


def upread(coarse: jnp.ndarray, out_shape: Sequence[int]) -> jnp.ndarray:
    """``out[p] = coarse[p >> 1]`` — read a parent-level array at fine indices.

    Works for any grid kind (cell/face/edge/node): repeat-by-2 along every
    axis and crop to ``out_shape``.  Requires ``out_shape[d] <= 2*coarse.shape[d]``.
    """
    out = coarse
    for d in range(coarse.ndim):
        out = jnp.repeat(out, 2, axis=d)
    return out[tuple(slice(0, s) for s in out_shape)]


def upread_adjoint(fine: jnp.ndarray, coarse_shape: Sequence[int]) -> jnp.ndarray:
    """Adjoint of :func:`upread`: ``out[c] = sum_{p: p>>1 == c} fine[p]``."""
    x = fine
    for d in range(fine.ndim):
        n = x.shape[d]
        target = 2 * coarse_shape[d]
        if n < target:
            x = grow(x, d, hi=target - n)
        # reshape (.., 2*c, ..) -> (.., c, 2, ..) and sum the pair axis
        shp = x.shape[:d] + (coarse_shape[d], 2) + x.shape[d + 1:]
        x = x.reshape(shp).sum(axis=d + 1)
    return x


def down_reduce_cells(arr: jnp.ndarray, op: str) -> jnp.ndarray:
    """Reduce 2x2x2 child cells onto the parent cell grid.

    ``arr`` has even extents.  ``op`` in {any, all, max, sum}.
    """
    assert all(s % 2 == 0 for s in arr.shape), arr.shape
    cx, cy, cz = (s // 2 for s in arr.shape)
    r = arr.reshape(cx, 2, cy, 2, cz, 2)
    axes = (1, 3, 5)
    if op == "any":
        return r.any(axes)
    if op == "all":
        return r.all(axes)
    if op == "max":
        return r.max(axes)
    if op == "sum":
        return r.sum(axes)
    raise ValueError(op)


def _block2(arr: jnp.ndarray, axes: Sequence[int], op: str) -> jnp.ndarray:
    """Reduce aligned pairs along ``axes`` (sizes must be even along them)."""
    out = arr
    for d in sorted(axes):
        assert out.shape[d] % 2 == 0, (out.shape, d)
        shp = out.shape[:d] + (out.shape[d] // 2, 2) + out.shape[d + 1:]
        r = out.reshape(shp)
        out = r.sum(axis=d + 1) if op == "sum" else r.max(axis=d + 1)
    return out


def block2_sum(arr, axes):
    return _block2(arr, axes, "sum")


def block2_max(arr, axes):
    return _block2(arr, axes, "max")


def repeat2(arr: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """Repeat each entry twice along ``axes`` (inverse shape of block2)."""
    out = arr
    for d in sorted(axes):
        out = jnp.repeat(out, 2, axis=d)
    return out


def strided_even(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Take even indices along ``axis`` (fine faces aligned with coarse ones)."""
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(0, None, 2)
    return arr[tuple(idx)]


def scatter_even(arr: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """Adjoint of :func:`strided_even`: place entries at even indices."""
    shp = list(arr.shape)
    n = shp[axis]
    shp[axis] = 2 * n
    out = jnp.zeros(shp, arr.dtype)
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(0, None, 2)
    out = out.at[tuple(idx)].set(arr)
    cur = out.shape[axis]
    if cur > out_size:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, out_size)
        out = out[tuple(sl)]
    elif cur < out_size:
        out = grow(out, axis, hi=out_size - cur)
    return out


def face_child_mean(fine: jnp.ndarray, axis: int, coarse_shape: Sequence[int]) -> jnp.ndarray:
    """Average the 4 child faces of each coarse face (getChildFace semantics).

    ``fine`` is a level-l face grid for ``axis``; children of coarse face F are
    at in-axis index 2*F[axis] and the 2x2 transverse block 2*F[t] + {0,1}
    (HDK_OctreeGrid.h:94-106).
    """
    x = strided_even(fine, axis)  # shape: in-axis R/2+1, transverse R
    t_axes = [d for d in range(3) if d != axis]
    x = block2_sum(x, t_axes) * 0.25
    assert x.shape == tuple(coarse_shape), (x.shape, coarse_shape)
    return x


def face_child_mean_adjoint(coarse: jnp.ndarray, axis: int, fine_shape: Sequence[int]) -> jnp.ndarray:
    """Adjoint of :func:`face_child_mean`."""
    t_axes = [d for d in range(3) if d != axis]
    x = repeat2(coarse * 0.25, t_axes)
    x = scatter_even(x, axis, fine_shape[axis])
    assert x.shape == tuple(fine_shape), (x.shape, fine_shape)
    return x


def face_shape(res: Sequence[int], axis: int):
    """Shape of a staggered face grid: +1 along ``axis`` (MAC convention)."""
    s = list(res)
    s[axis] += 1
    return tuple(s)


def edge_shape(res: Sequence[int], axis: int):
    """Shape of an edge grid for edges directed along ``axis``: +1 transverse."""
    s = [r + 1 for r in res]
    s[axis] = res[axis]
    return tuple(s)


def node_shape(res: Sequence[int]):
    return tuple(r + 1 for r in res)


def face_child_sum(fine: jnp.ndarray, axis: int, coarse_shape: Sequence[int]) -> jnp.ndarray:
    """Sum of the 4 child faces of each coarse face (unit weight per child)."""
    x = strided_even(fine, axis)
    t_axes = [d for d in range(3) if d != axis]
    x = block2_sum(x, t_axes)
    assert x.shape == tuple(coarse_shape), (x.shape, coarse_shape)
    return x


def face_child_sum_adjoint(coarse: jnp.ndarray, axis: int, fine_shape: Sequence[int]) -> jnp.ndarray:
    """Adjoint of :func:`face_child_sum`: broadcast to every child face."""
    t_axes = [d for d in range(3) if d != axis]
    x = repeat2(coarse, t_axes)
    x = scatter_even(x, axis, fine_shape[axis])
    assert x.shape == tuple(fine_shape), (x.shape, fine_shape)
    return x


def transverse_blocksum(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum over the aligned 2x2 transverse block containing each face
    (the inset child faces of a dangling-edge parent face,
    HDK_AdaptiveViscosity.cpp:1857-1880).  Self-adjoint."""
    t_axes = [d for d in range(3) if d != axis]
    return repeat2(block2_sum(arr, t_axes), t_axes)


def gather_offset(src: jnp.ndarray, out_shape: Sequence[int], offset: Sequence[int], fill=0):
    """``out[idx] = src[idx + offset]`` with out-of-bounds reading ``fill``.

    Shapes may differ (staggered-grid reads across grid kinds)."""
    pads, starts = [], []
    for d in range(3):
        lo = max(0, -offset[d])
        hi = max(0, offset[d] + out_shape[d] - src.shape[d])
        pads.append((lo, hi))
        starts.append(offset[d] + lo)
    p = jnp.pad(src, pads, constant_values=fill)
    return p[tuple(slice(s, s + n) for s, n in zip(starts, out_shape))]


def scatter_offset(w: jnp.ndarray, src_shape: Sequence[int], offset: Sequence[int]):
    """Adjoint of :func:`gather_offset`: ``out[idx + offset] += w[idx]``."""
    return gather_offset(w, src_shape, tuple(-o for o in offset))


def upread_k(coarse: jnp.ndarray, out_shape: Sequence[int], k: int) -> jnp.ndarray:
    """``out[p] = coarse[p >> k]`` — read an array k levels up at fine indices."""
    if k == 0:
        return coarse[tuple(slice(0, s) for s in out_shape)]
    out = coarse
    for d in range(coarse.ndim):
        out = jnp.repeat(out, 1 << k, axis=d)
    return out[tuple(slice(0, s) for s in out_shape)]


def even_snap(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """``out[i] = arr[i - (i & 1)]`` — snap odd indices to the even neighbour."""
    idx = jnp.arange(arr.shape[axis]).reshape(
        [arr.shape[axis] if d == axis else 1 for d in range(arr.ndim)]
    )
    odd = jnp.broadcast_to(idx % 2 == 1, arr.shape)
    return jnp.where(odd, shift(arr, axis, -1), arr)
