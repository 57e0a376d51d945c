"""Field sampling + supersampled volume-fraction integration weights.

TPU-native replacement for the reference's reliance on Houdini's
``SIM_RawField::computeSDFWeightsSampled`` supersampling and world-space
``getValue`` trilinear lookups (/root/reference/Source/HDK_AdaptiveViscosity.cpp:712-791).

All fields here are dense arrays on the finest grid:

* cell-sampled scalar fields: shape (nx, ny, nz)
* face-sampled fields (MAC): +1 along the face axis
* edge-sampled fields: +1 along both transverse axes

Because every sample target (cell center / edge center / sub-sample offset)
sits at a *uniform* fractional offset from the source grid, trilinear
interpolation reduces to fixed-weight combinations of shifted arrays — pure
fusible XLA, no gathers.

Sign conventions: liquid SDF negative inside the liquid; solid SDF negative
inside the solid (the reference's collision field is positive-inside; all
comparisons here are flipped accordingly and cited).
"""

from __future__ import annotations


from typing import Sequence

import jax.numpy as jnp

from .ops.arrayops import edge_shape, face_shape


def _axis_lerp(arr: jnp.ndarray, axis: int, offset: float) -> jnp.ndarray:
    """Sample ``arr`` at ``index + offset`` along ``axis`` with edge clamping.

    ``offset`` is any real; out-of-range reads clamp to the border value
    (Houdini ``getValue`` semantics).
    """
    import math

    base = math.floor(offset)
    frac = offset - base
    lo = _shift_clamped(arr, axis, base)
    if frac == 0.0:
        return lo
    hi = _shift_clamped(arr, axis, base + 1)
    return (1.0 - frac) * lo + frac * hi


def _shift_clamped(arr: jnp.ndarray, axis: int, offset: int) -> jnp.ndarray:
    """out[i] = arr[clamp(i + offset)] along ``axis``."""
    if offset == 0:
        return arr
    n = arr.shape[axis]
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (max(0, -offset), max(0, offset))
    padded = jnp.pad(arr, pad, mode="edge")
    idx = [slice(None)] * arr.ndim
    start = offset + max(0, -offset)
    idx[axis] = slice(start, start + n)
    return padded[tuple(idx)]


def sample_at_offset(arr: jnp.ndarray, offsets: Sequence[float]) -> jnp.ndarray:
    """Trilinear sample at a uniform offset (in index units) from every point."""
    out = arr
    for axis, off in enumerate(offsets):
        out = _axis_lerp(out, axis, off)
    return out


def cell_to_face_avg(cell_field: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Cell-sampled field interpolated to face centers (2-cell clamped mean).

    Equivalent to the reference's world-space ``getValue`` at a face center
    for aligned grids.
    """
    pad = [(0, 0)] * 3
    pad[axis] = (1, 1)
    p = jnp.pad(cell_field, pad, mode="edge")
    lo = [slice(None)] * 3
    hi = [slice(None)] * 3
    n = cell_field.shape[axis]
    lo[axis] = slice(0, n + 1)
    hi[axis] = slice(1, n + 2)
    return 0.5 * (p[tuple(lo)] + p[tuple(hi)])


def cell_to_edge_avg(cell_field: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Cell-sampled field interpolated to edge centers (4-cell clamped mean)."""
    out = cell_field
    for t in range(3):
        if t != axis:
            out = _pair_mean(out, t)
    return out


def _pair_mean(arr, axis):
    pad = [(0, 0)] * 3
    pad[axis] = (1, 1)
    p = jnp.pad(arr, pad, mode="edge")
    n = arr.shape[axis]
    lo = [slice(None)] * 3
    hi = [slice(None)] * 3
    lo[axis] = slice(0, n + 1)
    hi[axis] = slice(1, n + 2)
    return 0.5 * (p[tuple(lo)] + p[tuple(hi)])


def _supersample_offsets(num_samples: int):
    """Per-axis sub-sample offsets covering the unit dual cell: centers of
    ``num_samples`` equal strata of [-1/2, 1/2]."""
    return [(i + 0.5) / num_samples - 0.5 for i in range(num_samples)]


def integration_weights(
    liquid_sdf: jnp.ndarray,
    solid_sdf: jnp.ndarray,
    num_samples: int,
    extrapolation: float,
    apply_solid_weights: bool,
):
    """Center + 3 edge-type liquid volume fractions, optionally rescaled by
    solid open fractions (buildIntegrationWeights, cpp:748-791).

    Returns (center_w, [edge_w_x, edge_w_y, edge_w_z]) on staggered grids.
    """
    center_w = _staggered_fraction(liquid_sdf, "center", None, num_samples)
    edge_w = [_staggered_fraction(liquid_sdf, "edge", a, num_samples) for a in range(3)]

    if apply_solid_weights:
        # Reference: computeSDFWeightsSampled(solid, ..., -extrapolation) then
        # setScaleDivideThreshold(1, nullptr, &solidW, 0) — i.e. the liquid
        # fraction is divided by the open fraction of the solid dilated by
        # ``extrapolation`` (ghost-fluid theta), zeroed where fully closed
        # (cpp:772-790).  In our sign convention (solid SDF negative inside),
        # a sub-sample is open iff solid_sdf >= extrapolation, i.e.
        # (-solid_sdf) + extrapolation <= 0.
        center_open = _staggered_fraction(-solid_sdf, "center", None, num_samples,
                                          iso_offset=extrapolation)
        center_w = jnp.where(center_open > 0, center_w / jnp.maximum(center_open, 1e-30), 0.0)
        for a in range(3):
            open_a = _staggered_fraction(-solid_sdf, "edge", a, num_samples,
                                         iso_offset=extrapolation)
            edge_w[a] = jnp.where(open_a > 0, edge_w[a] / jnp.maximum(open_a, 1e-30), 0.0)
    return center_w, edge_w


def _staggered_fraction(sdf, kind, axis, num_samples, iso_offset=0.0):
    """Volume fraction evaluated on the full staggered target grid.

    Builds the target grid by sampling the cell-sampled SDF at the staggered
    positions (with clamped borders), then supersamples the dual cell.
    """
    subs = _supersample_offsets(num_samples)
    if kind == "center":
        base = [0.0, 0.0, 0.0]
        out_shape = sdf.shape
    elif kind == "edge":
        base = [0.0 if d == axis else -0.5 for d in range(3)]
        out_shape = edge_shape(sdf.shape, axis)
    elif kind == "face":
        base = [-0.5 if d == axis else 0.0 for d in range(3)]
        out_shape = face_shape(sdf.shape, axis)
    else:
        raise ValueError(kind)

    # Extend the cell SDF by one clamped layer where the target grid has an
    # extra sample so all sub-samples index in-range consistently.
    src = sdf
    shifts = [0, 0, 0]
    for d in range(3):
        if out_shape[d] == sdf.shape[d] + 1:
            pad = [(0, 0)] * 3
            pad[d] = (1, 1)
            src = jnp.pad(src, pad, mode="edge")
            shifts[d] = -1  # target index i sits at source index i - 1 + base

    acc = jnp.zeros(out_shape, jnp.float32)
    for ox in subs:
        sx = _axis_lerp(src, 0, base[0] + ox - shifts[0])[: out_shape[0]]
        for oy in subs:
            sy = _axis_lerp(sx, 1, base[1] + oy - shifts[1])[:, : out_shape[1]]
            for oz in subs:
                sz = _axis_lerp(sy, 2, base[2] + oz - shifts[2])[:, :, : out_shape[2]]
                acc = acc + (sz + iso_offset <= 0.0).astype(jnp.float32)
    return acc / float(num_samples ** 3)


def face_weights(
    liquid_sdf: jnp.ndarray,
    solid_sdf: jnp.ndarray,
    num_samples: int,
    extrapolation: float,
    apply_solid_weights: bool,
):
    """Liquid volume fractions at the 3 face grids — the "surfaceweights"
    input field the reference receives from the host FLIP solver (cpp:144,
    "faceWeights").  Computed with the same supersampling as the center/edge
    weights when the caller does not supply one.
    """
    ws = [_staggered_fraction(liquid_sdf, "face", a, num_samples) for a in range(3)]
    if apply_solid_weights:
        for a in range(3):
            open_a = _staggered_fraction(-solid_sdf, "face", a, num_samples,
                                         iso_offset=extrapolation)
            ws[a] = jnp.where(open_a > 0, ws[a] / jnp.maximum(open_a, 1e-30), 0.0)
    return ws
