"""Fused Pallas TPU kernels for the CG matvec — the hot loop of the solve.

One kernel per octree level computes every level-``l`` stress contribution of
``A u = M u + D^T W D u`` (the reference's CG SpMV,
/root/reference/Source/HDK_AdaptiveViscosity.cpp:611-643) in a single pass:
edge (shear) and center (normal) stress taus are built in-register from the
int8 classification grids, multiplied by the precomputed integration weights,
and immediately distributed back onto the velocity faces — no coefficient
array and no tau ever touches HBM.

Why this exists: the whole-array XLA formulation (:mod:`..operator`) moves
~800 MB of HBM traffic per matvec at 96^3 (measured via cost_analysis) because
every one of the ~400 per-term coefficient/gather chains materializes; the
speed-of-light traffic is just u + kinds + weights + out ≈ 60 MB.  Pallas
gives exactly that.

Layout — the "canonical embedding": every per-level array (face / edge /
cell sampled, any axis) is embedded into one shared halo-padded box per level:

    canonical[x + TX, y + 4, z + 4] = logical[x, y, z]

with ``TX`` the (even) x-tile size.  Pads are even, so logical parity ==
canonical parity and all the reference's parity-dependent cases (enhanced
sibling / dangling edges, cpp:1811-1895) read straight off an iota.  CG runs
entirely in canonical space (halos hold exact zeros / sentinel kinds), so the
embedding costs nothing per iteration.

Cross-level terms are linearized outside the kernel:

* parent reads  (T3/T4): ``up[f] = upread(u[l+1][f])``   — fine-shaped view
* child sums    (C2):    ``cs[f] = face_child_sum(u[l-1][f])``
* parent writes:  kernel emits fine-shaped ``zp``; ``out[l+1] += upread_adjoint(zp)``
* child writes:   kernel emits ``zc``; ``out[l-1] += face_child_sum_adjoint(zc)``

Each is a cheap strided XLA op on one array; everything dense and hot stays
in the kernel.  Term semantics (T1-T5, C1-C2) are bit-identical to
:mod:`..stencils` — equality with the v1 operator is property-tested.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import classify
from .arrayops import (
    face_child_sum,
    face_child_sum_adjoint,
    face_shape,
    upread,
    upread_adjoint,
)

FLUID = classify.FLUID
UNASSIGNED = classify.UNASSIGNED
SOLIDBOUNDARY = classify.SOLIDBOUNDARY
OUTSIDE = classify.OUTSIDE

UField = Dict[Tuple[int, int], jnp.ndarray]


# ---------------------------------------------------------------------------
# canonical embedding
# ---------------------------------------------------------------------------


MAX_HALO = 4  # largest slab halo any kernel DMAs (the D^T kernel's kinds)


@dataclasses.dataclass(frozen=True)
class Canon:
    """Per-level canonical box: all grid kinds share one padded shape.

    ``org`` crops the box to a window of the level (active-region cropping):
    canonical position ``off`` maps to LOGICAL cell ``org``, so the kernels
    sweep only the occupied part of the domain.  Each component is even, so
    logical parity still equals canonical parity and the parity-dependent
    stencil cases (enhanced siblings / dangling edges) are unchanged.  With
    ``org=(0,0,0)`` and a full-extent window this is the identity layout.

    ``TY`` switches the level to the y-BRICK layout (the big-plane path):
    the kernel grid gains a second dimension of ``KY`` y-bricks, every slab
    DMA carries a y slice ``[yb*TY, yb*TY + TY + 16)`` into a fresh VMEM
    buffer (offset-0 layout, so the concat shifts lower exactly as in the
    whole-plane kernels), and the y pad grows from 4 to 8 so both the slice
    start and size stay aligned to the sublane tile (8 rows for f32, 32 for
    int8 — hence ``TY`` must be a multiple of 32, the int8 kind grids ride
    the same slices).  Out-of-buffer y reads see zero fill, which is exact:
    stencil reads reach <= 4 rows past the out rows (same bound as the x
    halo MAX_HALO), so halo-8 bricks keep every out row correct."""

    res: Tuple[int, int, int]   # cell resolution of the level (full grid)
    TX: int                     # x tile size (even)
    K: int                      # number of interior x tiles
    PX: int                     # pad tiles on EACH side of x
    shape: Tuple[int, int, int]  # canonical array shape
    org: Tuple[int, int, int] = (0, 0, 0)  # logical cell origin (all even)
    TY: Optional[int] = None    # y brick size (multiple of 32) or None

    @property
    def off(self) -> Tuple[int, int, int]:
        return (self.PX * self.TX, 8 if self.TY else 4, 4)

    @property
    def grid(self) -> int:
        return self.K + 2 * self.PX

    @property
    def KY(self) -> int:
        """Number of y bricks (1 when unbricked)."""
        return (self.shape[1] - 16) // self.TY if self.TY else 1

    @property
    def cap(self) -> Tuple[int, int, int]:
        """Logical capacity of the window (rows available per axis)."""
        return (self.K * self.TX,
                self.shape[1] - (16 if self.TY else 8),
                self.shape[2] - 8)


def make_canon(res: Sequence[int], force_tx: int | None = None,
               bbox: Optional[Tuple[Tuple[int, int], ...]] = None,
               ty: Optional[int] = None) -> Canon:
    nx, ny, nz = res
    if bbox is not None:
        # active-region crop: ((x0,x1),(y0,y1),(z0,z1)) cell ranges, each
        # lo even (parity preservation), hi <= res.  The canonical window
        # covers cells [lo, hi) plus the staggered closing row.
        org = tuple(int(b[0]) for b in bbox)
        for d, b in enumerate(bbox):
            if b[0] % 2 != 0:
                raise ValueError(f"bbox lo must be even, got {bbox}")
            if not (0 <= b[0] < b[1] <= res[d]):
                raise ValueError(f"bad bbox {bbox} for res {res}")
        nx, ny, nz = (b[1] - b[0] for b in bbox)
    else:
        org = (0, 0, 0)
    # TX sets the x-tile.  Under the 16 MB default scoped-VMEM cap big
    # levels were locked at TX=2; with the raised cap (VMEM_LIMIT) TX=4
    # measures fastest at 96^3 (fused 3.19 ms vs 3.75 at TX=2, TX=8 within
    # noise of TX=4): larger tiles amortize both the halo reread and the
    # stress-row recompute (rows TX+4 per TX out rows).
    # ``force_tx`` lets tests exercise the small-TX (PX>1) layout on small
    # grids, where TX < MAX_HALO puts DMA starts in the second pad tile.
    TX = force_tx or 4
    if TX % 2 != 0:
        # the whole parity scheme (even pads, slab starts i*TX-2) relies on
        # TX even; an odd TX would silently corrupt enhanced-sibling /
        # dangling parities rather than fail.
        raise ValueError(f"x tile size must be even, got TX={TX}")
    K = -(-(nx + 1) // TX)
    # x pads must cover the largest slab halo: the DMA for interior tile i
    # spans [i*TX - h, i*TX + TX + h) and must stay inside the buffer.
    PX = -(-MAX_HALO // TX)
    # y/z are rounded up to the f32 tile (8, 128): the physical layout pads
    # minor dims to tiles anyway, and Mosaic only DMAs slices whose minor
    # dims match the memref — aligning the logical shape costs nothing real.
    if ty is not None:
        if ty % 32 != 0 or ty < 32:
            # int8 kind grids ride the same y slices; their sublane tile is
            # 32 rows, so brick starts/sizes must be 32-aligned
            raise ValueError(f"y brick size must be a multiple of 32, got {ty}")
        cy = -(-(ny + 1) // ty) * ty + 16
    else:
        cy = -(-(ny + 1 + 8) // 8) * 8
    cz = -(-(nz + 1 + 8) // 128) * 128
    shape = ((K + 2 * PX) * TX, cy, cz)
    return Canon(tuple(res), TX, K, PX, shape, org, ty)


def embed(arr: jnp.ndarray, canon: Canon, fill=0) -> jnp.ndarray:
    """Logical array -> canonical box (cropping to the window when the
    canon carries an active-region ``org``; values outside the window are
    sentinels/zeros by construction, see occupied_bboxes)."""
    ox, oy, oz = canon.off
    gx, gy, gz = canon.org
    kx, ky, kz = canon.cap
    arr = arr[gx:gx + kx, gy:gy + ky, gz:gz + kz]
    sx, sy, sz = arr.shape
    cx, cy, cz = canon.shape
    return jnp.pad(
        arr,
        ((ox, cx - ox - sx), (oy, cy - oy - sy), (oz, cz - oz - sz)),
        constant_values=fill,
    )


def crop(arr: jnp.ndarray, canon: Canon, shape: Sequence[int]) -> jnp.ndarray:
    """Canonical box -> full logical array (zero outside the window)."""
    ox, oy, oz = canon.off
    gx, gy, gz = canon.org
    sx, sy, sz = shape
    wx = min(canon.cap[0], sx - gx)
    wy = min(canon.cap[1], sy - gy)
    wz = min(canon.cap[2], sz - gz)
    w = arr[ox:ox + wx, oy:oy + wy, oz:oz + wz]
    if (wx, wy, wz) == tuple(shape):
        return w
    return jnp.pad(
        w, ((gx, sx - gx - wx), (gy, sy - gy - wy), (gz, sz - gz - wz))
    )


# ---------------------------------------------------------------------------
# canonical-to-canonical cross-level views/adjoints
#
# The apply's cross-level terms used to round-trip through full logical
# arrays (crop -> upread/child_sum -> embed).  Logical face shapes have odd
# minor extents, so every hop forced an XLA relayout/copy against the
# (8, 128)-tiled canonical layout — measured at ~0.9 ms/apply of "glue" at
# 96^3, ~40% of the whole matvec.  These versions map canonical boxes to
# canonical boxes directly: all intermediates keep tile-friendly canonical
# extents, and the even-parity pads/origins make the level-to-level index
# algebra a constant offset (derivations inline).
# ---------------------------------------------------------------------------


def _c2c_A(cf: Canon, cc: Canon):
    """Per-axis A with fine canonical vf reading coarse canonical
    ``(vf >> 1) + A``: logical pf = org_f + vf - off_f, parent pf>>1 at
    coarse canonical off_c + (pf>>1) - org_c; all offsets even."""
    return tuple(
        oc - gc + (gf - of) // 2
        for of, oc, gf, gc in zip(cf.off, cc.off, cf.org, cc.org)
    )


def _interleave2(x: jnp.ndarray, zero_axes=()) -> jnp.ndarray:
    """out[2i+p, 2j+q, 2k+r] = x[i,j,k] in ONE broadcast+reshape (chained
    per-axis jnp.repeat compiles to transposed-layout copies on TPU —
    measured ~40% slower applies).  Axes in ``zero_axes`` place x at the
    even slot and ZERO at the odd slot instead of duplicating."""
    X, Y, Z = x.shape
    b = jnp.broadcast_to(x[:, None, :, None, :, None], (X, 2, Y, 2, Z, 2))
    for d in zero_axes:
        shape = [1] * 6
        shape[2 * d + 1] = 2
        keep = jnp.arange(2).reshape(shape) == 0
        b = jnp.where(keep, b, 0)
    return b.reshape(2 * X, 2 * Y, 2 * Z)


def up_view_c2c(uc: jnp.ndarray, cc: Canon, cf: Canon) -> jnp.ndarray:
    """Fine-canonical view of a coarse-canonical array:
    out[v] = uc[(v >> 1) + A] — equals embed(upread(crop(uc)), cf) on the
    fine window (outside it, parent values carry through; every consumer
    masks by kind planes that are OUTSIDE there)."""
    from .arrayops import gather_offset

    A = _c2c_A(cf, cc)
    half = tuple(s // 2 for s in cf.shape)  # canonical extents are even
    src = gather_offset(uc, half, A, fill=0)
    return _interleave2(src)


def up_adjoint_c2c(zf: jnp.ndarray, cf: Canon, cc: Canon) -> jnp.ndarray:
    """Adjoint of :func:`up_view_c2c`:
    out[vc] = sum_{d in {0,1}^3} zf[2*(vc - A) + d]."""
    from .arrayops import gather_offset

    A = _c2c_A(cf, cc)
    X, Y, Z = zf.shape
    w = zf.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).sum(axis=(1, 3, 5))
    return gather_offset(w, cc.shape, tuple(-a for a in A), fill=0)


def _c2c_B(cf: Canon, cc: Canon):
    """Per-axis B with coarse canonical vc owning fine children at
    ``2*vc + B + d``: child logical = 2*(org_c + vc - off_c) + d at fine
    canonical off_f + child - org_f."""
    return tuple(
        of - gf + 2 * gc - 2 * oc
        for of, oc, gf, gc in zip(cf.off, cc.off, cf.org, cc.org)
    )


def cs_view_c2c(uf: jnp.ndarray, cf: Canon, cc: Canon, axis: int) -> jnp.ndarray:
    """Coarse-canonical child sum of a fine-canonical face array:
    out[vc] = sum_{dt} uf[2*vc + B + dt] over the 2x2 transverse block
    (d = 0 along the face axis) — embed(face_child_sum(crop(uf)), cc)
    without the logical round trip."""
    from .arrayops import gather_offset

    B = _c2c_B(cf, cc)
    w = gather_offset(uf, tuple(2 * s for s in cc.shape), B, fill=0)
    X2, Y2, Z2 = w.shape
    r = w.reshape(X2 // 2, 2, Y2 // 2, 2, Z2 // 2, 2)
    # face axis: even child only (drops that pair dim); transverse: sum pairs
    idx = [slice(None)] * 6
    idx[2 * axis + 1] = 0
    r = r[tuple(idx)]
    pair_dims = [2 * t + 1 for t in range(3) if t != axis]
    pair_dims = [d - 1 if d > 2 * axis + 1 else d for d in pair_dims]
    return r.sum(axis=tuple(pair_dims))


def cs_adjoint_c2c(zc: jnp.ndarray, cc: Canon, cf: Canon, axis: int) -> jnp.ndarray:
    """Adjoint of :func:`cs_view_c2c`: broadcast each coarse value to its 4
    children (even fine index along the face axis)."""
    from .arrayops import gather_offset

    B = _c2c_B(cf, cc)
    w = _interleave2(zc, zero_axes=(axis,))
    return gather_offset(w, cf.shape, tuple(-b for b in B), fill=0)


# ---------------------------------------------------------------------------
# matmul ("mm") glue: the same canonical-to-canonical maps with every y/z
# interleave/compaction expressed as a contraction against a constant 0/1
# matrix.  On TPU the broadcast+reshape interleave of the c2c variants is a
# sublane/lane shuffle XLA lowers catastrophically (measured 34.9 ms/apply
# vs 2.65 for the logical-shape glue at 96^3); a (Y_in, Y_out) 0/1 matmul
# rides the MXU instead.  x (the untiled major dim) keeps cheap
# repeat/reshape forms, and all matmuls run at COARSE x extent — the x
# expansion happens last (views) or first (adjoints).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _expand_mat(n_in: int, n_out: int, a: int):
    """E[i, j] = 1 where (j >> 1) + a == i  (fine j reads coarse i)."""
    import numpy as np

    j = np.arange(n_out)
    i = (j >> 1) + a
    e = np.zeros((n_in, n_out), np.float32)
    ok = (0 <= i) & (i < n_in)
    e[i[ok], j[ok]] = 1.0
    # NB: cached value must stay a host constant — jnp.asarray under an
    # active trace would cache a tracer (leaks into every later trace)
    return e


@functools.lru_cache(maxsize=None)
def _pick_mat(n_in: int, n_out: int, b: int, pair: bool):
    """P[i, j] = 1 where i == 2j + b (+1 too when ``pair``): coarse j sums
    the fine pair (or picks the even child) at offset ``b``."""
    import numpy as np

    j = np.arange(n_out)
    p = np.zeros((n_in, n_out), np.float32)
    for d in range(2 if pair else 1):
        i = 2 * j + b + d
        ok = (0 <= i) & (i < n_in)
        p[i[ok], j[ok]] = 1.0
    return p  # host constant (see _expand_mat)


def _mm_yz(w: jnp.ndarray, my: jnp.ndarray, mz: jnp.ndarray) -> jnp.ndarray:
    # HIGHEST precision: the default TPU matmul rounds f32 inputs to bf16,
    # which would perturb the CG iterate; with 0/1 matrices and <=2 terms
    # per output the f32-decomposed passes reproduce plain f32 arithmetic
    hi = jax.lax.Precision.HIGHEST
    w = jnp.einsum("xyz,zw->xyw", w, mz, precision=hi)
    return jnp.einsum("xyz,yu->xuz", w, my, precision=hi)


def _x_expand(w: jnp.ndarray, n_out: int, a: int) -> jnp.ndarray:
    """out[r] = w[(r >> 1) + a] along axis 0 (major dim: cheap copies)."""
    from .arrayops import gather_offset

    r = jnp.repeat(w, 2, axis=0)  # r[2i + p] = w[i]
    return gather_offset(r, (n_out,) + w.shape[1:], (2 * a, 0, 0), fill=0)


def _x_reduce(w: jnp.ndarray, n_out: int, b: int, pair: bool) -> jnp.ndarray:
    """out[u] = w[2u + b] (+ w[2u + b + 1] when ``pair``) along axis 0."""
    from .arrayops import gather_offset

    g = gather_offset(w, (2 * n_out,) + w.shape[1:], (b, 0, 0), fill=0)
    r = g.reshape((n_out, 2) + w.shape[1:])
    return r.sum(axis=1) if pair else r[:, 0]


def up_view_mm(uc: jnp.ndarray, cc: Canon, cf: Canon) -> jnp.ndarray:
    """MXU form of :func:`up_view_c2c` (equal where consumers read)."""
    A = _c2c_A(cf, cc)
    Xf, Yf, Zf = cf.shape
    w = _mm_yz(uc, _expand_mat(cc.shape[1], Yf, A[1]),
               _expand_mat(cc.shape[2], Zf, A[2]))
    return _x_expand(w, Xf, A[0])


def up_adjoint_mm(zf: jnp.ndarray, cf: Canon, cc: Canon) -> jnp.ndarray:
    """MXU form of :func:`up_adjoint_c2c` (exactly equal)."""
    A = _c2c_A(cf, cc)
    Xc, Yc, Zc = cc.shape
    w = _x_reduce(zf, Xc, -2 * A[0], pair=True)
    return _mm_yz(w, _expand_mat(Yc, cf.shape[1], A[1]).T,
                  _expand_mat(Zc, cf.shape[2], A[2]).T)


def cs_view_mm(uf: jnp.ndarray, cf: Canon, cc: Canon, axis: int) -> jnp.ndarray:
    """MXU form of :func:`cs_view_c2c` (exactly equal)."""
    B = _c2c_B(cf, cc)
    Xc, Yc, Zc = cc.shape
    w = _x_reduce(uf, Xc, B[0], pair=axis != 0)
    return _mm_yz(w, _pick_mat(cf.shape[1], Yc, B[1], axis != 1),
                  _pick_mat(cf.shape[2], Zc, B[2], axis != 2))


def cs_adjoint_mm(zc: jnp.ndarray, cc: Canon, cf: Canon, axis: int) -> jnp.ndarray:
    """MXU form of :func:`cs_adjoint_c2c` (exactly equal)."""
    B = _c2c_B(cf, cc)
    Xf, Yf, Zf = cf.shape
    w = _mm_yz(zc, _pick_mat(Yf, cc.shape[1], B[1], axis != 1).T,
               _pick_mat(Zf, cc.shape[2], B[2], axis != 2).T)
    # adjoint of out[u] = w[2u + b] (+pair): scatter back along x
    from .arrayops import gather_offset

    if axis != 0:
        r = jnp.repeat(w, 2, axis=0)             # rows 2u, 2u+1 <- w[u]
    else:
        r = _interleave_x_zero(w)                # row 2u <- w[u], 2u+1 <- 0
    return gather_offset(r, (Xf,) + w.shape[1:], (-B[0], 0, 0), fill=0)


def _interleave_x_zero(w: jnp.ndarray) -> jnp.ndarray:
    """out[2u] = w[u], out[2u+1] = 0 along axis 0 (major dim: free reshape)."""
    z = jnp.zeros_like(w)
    return jnp.stack([w, z], axis=1).reshape((2 * w.shape[0],) + w.shape[1:])


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on loaded slab VALUES, not refs)
# ---------------------------------------------------------------------------


def _sh_yz(v: jnp.ndarray, axis: int, o: int, fill):
    """Shift along y/z with fill: out[..., j, ...] = v[..., j+o, ...]."""
    if o == 0:
        return v
    blk = list(v.shape)
    blk[axis] = abs(o)
    fb = jnp.full(tuple(blk), fill, v.dtype)
    idx_hi = [slice(None)] * 3
    idx_hi[axis] = slice(o, None)
    idx_lo = [slice(None)] * 3
    idx_lo[axis] = slice(None, o)
    if o > 0:
        return jnp.concatenate([v[tuple(idx_hi)], fb], axis=axis)
    return jnp.concatenate([fb, v[tuple(idx_lo)]], axis=axis)


def _rd(slab: jnp.ndarray, base: int, rows: int, off, fill):
    """Rows [base+ox, base+ox+rows) of the slab, shifted by (oy, oz)."""
    v = slab[base + off[0]: base + off[0] + rows]
    v = _sh_yz(v, 1, off[1], fill)
    v = _sh_yz(v, 2, off[2], fill)
    return v


def _parity_even_f(shape, axis, base: int):
    """1.0 where the canonical (== logical) index along ``axis`` is even,
    else 0.0.  Float (not i1): Mosaic's 3D bool-vector relayouts are
    unsupported, so all masks in these kernels are float arithmetic.

    ``base``: canonical-parity offset of local index 0 along ``axis``
    (even everywhere by construction)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return (1 - ((ids + base) & 1)).astype(jnp.float32)


def _blocksum_t(v: jnp.ndarray, t_axes, parity_bases):
    """Aligned 2x2 transverse block sum at every position (in-register
    transverse_blocksum): per t-axis, add the parity partner."""
    out = v
    for ax in t_axes:
        even = _parity_even_f(out.shape, ax, parity_bases[ax])
        out = out + (
            even * _sh_yz_or_x(out, ax, 1)
            + (1.0 - even) * _sh_yz_or_x(out, ax, -1)
        )
    return out


def _sh_yz_or_x(v: jnp.ndarray, axis: int, o: int):
    """Zero-fill shift along any axis of an in-register value."""
    if o == 0:
        return v
    if axis == 0:
        blk = (abs(o),) + v.shape[1:]
        fb = jnp.zeros(blk, v.dtype)
        if o > 0:
            return jnp.concatenate([v[o:], fb], axis=0)
        return jnp.concatenate([fb, v[:o]], axis=0)
    return _sh_yz(v, axis, o, 0.0)


def _unit(axis, sign=1):
    off = [0, 0, 0]
    off[axis] = sign
    return tuple(off)


def _add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _neg(a):
    return tuple(-x for x in a)


# ---------------------------------------------------------------------------
# the per-level kernel
# ---------------------------------------------------------------------------

KIND_DT = jnp.int8
F32 = jnp.float32


def _eqf(x, c):
    """0/1 float equality with an integer constant (exact for int-valued
    floats).  All masks are float: Mosaic cannot relayout 3D i1 vectors."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x - float(c)))


def _edge_terms(a, dxw, enhanced, has_parent, kind, val, pbase,
                with_values: bool, valw=None):
    """Yield every edge-stress term (coeff, value|None, off, dest) for edge
    axis ``a`` — the per-slot case analysis of getEdgeStressFaces
    (/root/reference/Source/HDK_AdaptiveViscosity.cpp:1717-1908), identical
    to stencils.build_edge_stress_blocks.

    ``kind``/``val`` are slab accessors bound to the caller's row range;
    each yielded coefficient is consumed immediately, keeping VMEM liveness
    to a couple of arrays.
    """
    active_edge = _eqf(kind(f"ek{a}"), FLUID)
    f_axes = [f for f in range(3) if f != a]
    for f in f_axes:
        g = 3 - a - f
        k0 = kind(f"vk{f}", _unit(g, -1))
        k1 = kind(f"vk{f}")
        una0, una1 = _eqf(k0, UNASSIGNED), _eqf(k1, UNASSIGNED)
        binv = 1.0 / (dxw * (1.0 + 0.5 * (una0 + una1)))
        if enhanced:
            is_trans = una0 + una1 - una0 * una1
            not_out = (
                (1.0 - _eqf(k0, OUTSIDE) - _eqf(k0, SOLIDBOUNDARY))
                * (1.0 - _eqf(k1, OUTSIDE) - _eqf(k1, SOLIDBOUNDARY))
            )
            enh = is_trans * not_out
        for d in (0, 1):
            off = _unit(g, -1) if d == 0 else (0, 0, 0)
            sign = -1.0 if d == 0 else 1.0
            k = k0 if d == 0 else k1
            act = _eqf(k, FLUID) * active_edge
            base = sign * binv

            # T1: the face itself
            if enhanced:
                c1 = act * (0.5 - 0.25 * enh) * base
            else:
                c1 = act * 0.5 * base
            yield (c1, val(f"u{f}", off) if with_values else None,
                   off, ("same", f))

            # T2: enhanced sibling at a parity offset along the edge axis
            if enhanced:
                par_even = _parity_even_f(k.shape, a, pbase[a])
                for even, so in ((True, 1), (False, -1)):
                    par = par_even if even else 1.0 - par_even
                    c2 = act * enh * par * 0.25 * base
                    o2 = _add(off, _unit(a, so))
                    yield (c2, val(f"u{f}", o2) if with_values else None,
                           o2, ("same", f))

            una = _eqf(k, UNASSIGNED) * active_edge
            if has_parent:
                dang = 1.0 - _parity_even_f(k.shape, f, pbase[f])
                # T3: non-dangling transition → parent face
                c3 = una * (1.0 - dang) * 0.5 * base
                yield (c3, val(f"up{f}", off) if with_values else None,
                       off, ("parent", f))
                # T4/T5: dangling edge → two parent faces or 4 inset kids
                for so in (-1, 1):
                    offo = _add(off, _unit(f, so))
                    kp = kind(f"pk{f}", offo)
                    c4 = una * dang * _eqf(kp, FLUID) * 0.25 * base
                    yield (c4, val(f"up{f}", offo) if with_values else None,
                           offo, ("parent", f))
                    c5 = una * dang * _eqf(kp, UNASSIGNED) * 0.0625 * base
                    if with_values:
                        t_axes = [t for t in range(3) if t != f]
                        # forward reads B(u)[i + offo]: the 2x2 block aligns
                        # at i + offo → parity base shifts by offo.  The
                        # blocksum runs on an x-EXPANDED window (one extra
                        # row each side): when pb[0] is odd the partner of
                        # the window's first/last row lies outside the out
                        # rows, and a TX-row window would zero-fill it.
                        pb = {ax: pbase[ax] + offo[ax] for ax in range(3)}
                        pbw = dict(pb)
                        pbw[0] -= 1
                        wide = valw(f"u{f}", offo)
                        bsw = _blocksum_t(wide, t_axes, pbw)
                        bs = bsw[1:wide.shape[0] - 1]
                    else:
                        bs = None
                    yield (c5, bs, offo, ("blocksum", f))


def _center_terms(axis, dxw, has_child, kind, val, act_c, with_values: bool):
    """Center-stress terms (getCenterStressFaces, cpp:1910-1963)."""
    for d in (0, 1):
        off = (0, 0, 0) if d == 0 else _unit(axis, 1)
        sign = -1.0 if d == 0 else 1.0
        k = kind(f"vk{axis}", off)
        c1 = _eqf(k, FLUID) * act_c * (sign / dxw)
        yield (c1, val(f"u{axis}", off) if with_values else None, off, "same")
        if has_child:
            c2 = _eqf(k, UNASSIGNED) * act_c * (0.25 * sign / dxw)
            yield (c2, val(f"cs{axis}", off) if with_values else None,
                   off, "child")


def _pack_groups(level: int, levels: int):
    """Kind grids bit-packed 3-per-int8 (codes = -kind fit in 2 bits, and
    3 x 2-bit slots keep the byte <= 63, signed-int8 safe).

    The apply is HBM-bandwidth bound (~205 GB/s effective on this device)
    and the int8 kind grids pay the largest halo reread factor (3-5x), so
    packing cuts ~60% of that traffic for ~5 extra VPU ops per read.
    """
    fields = [f"vk{f}" for f in range(3)]
    fields += [f"ek{a}" for a in range(3)]
    fields += ["ck"]
    if level + 1 < levels:
        fields += [f"pk{f}" for f in range(3)]
    return [fields[i:i + 3] for i in range(0, len(fields), 3)]


PACK_FILL = 63  # OUTSIDE (code 3) in every 2-bit slot


def _kind_slot_map(level: int, levels: int):
    return {
        name: (g, slot)
        for g, group in enumerate(_pack_groups(level, levels))
        for slot, name in enumerate(group)
    }


def _decode_kind(raw_f32: jnp.ndarray, slot: int) -> jnp.ndarray:
    """Extract 2-bit slot ``slot`` from the packed byte (as f32) and map
    code -> sentinel kind (kind = -code): pure float arithmetic."""
    y = jnp.floor(raw_f32 * (0.25 ** slot)) if slot else raw_f32
    return 4.0 * jnp.floor(y * 0.25) - y


def _tau_input_names(level: int, levels: int):
    """(name, dtype, slab_halo): taus are computed on exactly the out rows,
    so stencil-read inputs need halo 2 and weight inputs none."""
    names = [(f"u{f}", F32, 2) for f in range(3)]
    if level + 1 < levels:
        names += [(f"up{f}", F32, 2) for f in range(3)]
    if level > 0:
        names += [(f"cs{f}", F32, 2) for f in range(3)]
    names += [(f"kp{g}", KIND_DT, 2)
              for g in range(len(_pack_groups(level, levels)))]
    names += [(f"we{a}", F32, 0) for a in range(3)]
    names += [("wc", F32, 0)]
    return names


def _dt_input_names(level: int, levels: int):
    """(name, dtype, slab_halo): products live on out rows +-2, wtaus are
    read unshifted (halo 2) while kind grids are read at +-1 (halo 4)."""
    names = [(f"wte{a}", F32, 2) for a in range(3)]
    names += [(f"wtc{x}", F32, 2) for x in range(3)]
    names += [(f"kp{g}", KIND_DT, 4)
              for g in range(len(_pack_groups(level, levels)))]
    # mass term + active mask are folded into this kernel (saves a
    # full-tree XLA pass per iteration); u/m are read on out rows only
    names += [(f"u{f}", F32, 0) for f in range(3)]
    names += [(f"m{f}", F32, 0) for f in range(3)]
    return names


def _dt_output_names(level: int, levels: int) -> List[str]:
    names = [f"out{f}" for f in range(3)]
    if level + 1 < levels:
        names += [f"zp{f}" for f in range(3)]
    if level > 0:
        names += [f"zc{f}" for f in range(3)]
    return names


def _level_kernel(compute, canon: Canon, in_names, out_names):
    """Wrap a per-slab ``compute(v, halo) -> out values`` into a kernel.

    Unbricked (``canon.TY is None``): 1D x grid, BlockSpec VMEM outputs —
    exactly the historical protocol.  Bricked: 2D (x, y-brick) grid, slab
    DMAs carry an aligned y slice ``[yb*TY, yb*TY + TY + 16)`` into fresh
    (offset-0) VMEM buffers, and outputs go to HBM by manual DMA — out rows
    ``[8, 8+TY)`` of the brick plus, on the first/last brick, the zero y
    pads (every slice start/size is a multiple of 8, the f32 sublane tile,
    and of 32 where int8 kinds ride along, since TY % 32 == 0)."""
    TX = canon.TX
    CX, CY, CZ = canon.shape
    NIN, NOUT = len(in_names), len(out_names)

    if canon.TY is None:

        def kernel(*refs):
            ins = refs[:NIN]
            outs = refs[NIN:NIN + NOUT]
            scratch = refs[NIN + NOUT:NIN + NOUT + NIN]
            sems = refs[NIN + NOUT + NIN]

            # programs 0 and K+1 own the halo blocks: zero them so every
            # row of the output buffers is defined
            i = pl.program_id(0)
            interior = jnp.logical_and(i >= canon.PX,
                                       i < canon.PX + canon.K)

            @pl.when(jnp.logical_not(interior))
            def _():
                for j in range(NOUT):
                    outs[j][:] = jnp.zeros((TX, CY, CZ), F32)

            @pl.when(interior)
            def _():
                copies = [
                    pltpu.make_async_copy(
                        ins[j].at[pl.ds(i * TX - h, TX + 2 * h)],
                        scratch[j], sems.at[j]
                    )
                    for j, (_, _, h) in enumerate(in_names)
                ]
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()
                v, halo = {}, {}
                for j, (name, _, h) in enumerate(in_names):
                    v[name] = scratch[j][:]
                    halo[name] = h
                for j, val_out in enumerate(compute(v, halo)):
                    outs[j][:] = val_out

        return kernel

    TY, KY = canon.TY, canon.KY
    BY = TY + 16

    def kernel(*refs):
        ins = refs[:NIN]
        outs = refs[NIN:NIN + NOUT]
        scratch = refs[NIN + NOUT:NIN + NOUT + NIN]
        oscr = refs[NIN + NOUT + NIN:NIN + NOUT + NIN + NOUT]
        sems = refs[NIN + NOUT + NIN + NOUT]
        osems = refs[NIN + NOUT + NIN + NOUT + 1]

        i = pl.program_id(0)
        yb = pl.program_id(1)
        interior = jnp.logical_and(i >= canon.PX, i < canon.PX + canon.K)
        z8 = jnp.zeros((TX, 8, CZ), F32)

        @pl.when(jnp.logical_not(interior))
        def _():
            for j in range(NOUT):
                oscr[j][:] = jnp.zeros((TX, BY, CZ), F32)

        @pl.when(interior)
        def _():
            copies = [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(i * TX - h, TX + 2 * h),
                              pl.ds(yb * TY, BY)],
                    scratch[j], sems.at[j]
                )
                for j, (_, _, h) in enumerate(in_names)
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            v, halo = {}, {}
            for j, (name, _, h) in enumerate(in_names):
                v[name] = scratch[j][:]
                halo[name] = h
            for j, val_out in enumerate(compute(v, halo)):
                # halo rows of the computed value are contaminated by the
                # brick-edge zero fill; only rows [8, 8+TY) are emitted,
                # and the stored halo rows become the zero y pads
                oscr[j][:] = jnp.concatenate(
                    [z8, val_out[:, 8:8 + TY], z8], axis=1
                )

        # out DMA (all programs: x-pad programs write the zeroed blocks)
        main = [
            pltpu.make_async_copy(
                oscr[j].at[:, pl.ds(8, TY)],
                outs[j].at[pl.ds(i * TX, TX), pl.ds(8 + yb * TY, TY)],
                osems.at[j, 0],
            )
            for j in range(NOUT)
        ]
        for c in main:
            c.start()

        @pl.when(yb == 0)
        def _():
            pads = [
                pltpu.make_async_copy(
                    oscr[j].at[:, pl.ds(0, 8)],
                    outs[j].at[pl.ds(i * TX, TX), pl.ds(0, 8)],
                    osems.at[j, 1],
                )
                for j in range(NOUT)
            ]
            for c in pads:
                c.start()
            for c in pads:
                c.wait()

        @pl.when(yb == KY - 1)
        def _():
            pads = [
                pltpu.make_async_copy(
                    oscr[j].at[:, pl.ds(TY + 8, 8)],
                    outs[j].at[pl.ds(i * TX, TX), pl.ds(8 + KY * TY, 8)],
                    osems.at[j, 2],
                )
                for j in range(NOUT)
            ]
            for c in pads:
                c.start()
            for c in pads:
                c.wait()

        for c in main:
            c.wait()

    return kernel


def _make_tau_kernel(level: int, levels: int, canon: Canon, dx: float,
                     enhanced: bool):
    """Kernel 1: weighted stress taus for one level.

    Slab halo 2 (rows TX+4, canonical x slab start = TX + i*TX - 2, even so
    local parity == canonical parity).  Taus are computed exactly on the
    output rows (local [2, TX+2)); all reads (offsets +-1, blocksum +-2)
    stay in-slab.  Outputs: 3 edge wtaus + 3 center wtaus.
    """
    TX = canon.TX
    CX, CY, CZ = canon.shape
    H = 2
    R, BT = TX, H
    dxw = dx * (1 << level)
    in_names = _tau_input_names(level, levels)
    out_names = [f"wte{a}" for a in range(3)] + [f"wtc{x}" for x in range(3)]
    NIN, NOUT = len(in_names), len(out_names)
    has_parent = level + 1 < levels
    has_child = level > 0
    pbase = {0: 0, 1: 0, 2: 0}
    smap = _kind_slot_map(level, levels)

    def compute(v, halo):
        """The 6 weighted-tau out blocks from loaded slab values."""
        # packed int8 kind slabs decode lazily per read so the f32
        # copies die immediately.  Read base: slab row h covers the
        # first out row.
        def kind(name, off=(0, 0, 0)):
            g, slot = smap[name]
            raw = _rd(v[f"kp{g}"], halo[f"kp{g}"], R, off, PACK_FILL)
            return _decode_kind(raw.astype(F32), slot)

        def val(name, off=(0, 0, 0)):
            return _rd(v[name], halo[name], R, off, 0.0)

        def valw(name, off=(0, 0, 0)):
            # x-expanded read for the T5 blocksum: one extra row each
            # side so odd-aligned block partners stay in-window
            return _rd(v[name], halo[name] - 1, R + 2, off, 0.0)

        values = []
        for a in range(3):
            tau = None
            for c, uv, off, dest in _edge_terms(
                a, dxw, enhanced, has_parent, kind, val, pbase, True,
                valw=valw,
            ):
                contrib = c * uv
                tau = contrib if tau is None else tau + contrib
            values.append(val(f"we{a}") * tau)

        act_c = _eqf(kind("ck"), FLUID)
        wcv = val("wc")
        for axis in range(3):
            tau = None
            for c, uv, off, dest in _center_terms(
                axis, dxw, has_child, kind, val, act_c, True
            ):
                contrib = c * uv
                tau = contrib if tau is None else tau + contrib
            values.append(wcv * tau)
        return values

    kernel = _level_kernel(compute, canon, in_names, out_names)
    return kernel, in_names, out_names


def _make_dt_kernel(level: int, levels: int, canon: Canon, dx: float,
                    enhanced: bool):
    """Kernel 2: distribute c * wtau back onto the faces (D^T).

    Slab halo 4: coefficient/product rows live on local [2, TX+6) so the
    +-1 adjoint shifts and the 2-wide blocksum reads stay in-slab; output
    rows are local [4, TX+4).  The mass term and all cross-level expansion
    happen outside in XLA.
    """
    TX = canon.TX
    CX, CY, CZ = canon.shape
    H = 4
    R, BT, BO = TX + 4, 2, 4
    dxw = dx * (1 << level)
    in_names = _dt_input_names(level, levels)
    out_names = _dt_output_names(level, levels)
    NIN, NOUT = len(in_names), len(out_names)
    has_parent = level + 1 < levels
    has_child = level > 0
    pbase = {0: 0, 1: 0, 2: 0}
    smap = _kind_slot_map(level, levels)

    def compute(v, halo):
        plane = v["u0"].shape[1:]

        # product rows span out rows +-2: base = slab_halo - 2
        def kind(name, off=(0, 0, 0)):
            g, slot = smap[name]
            raw = _rd(v[f"kp{g}"], halo[f"kp{g}"] - 2, R, off,
                      PACK_FILL)
            return _decode_kind(raw.astype(F32), slot)

        def val(name, off=(0, 0, 0)):
            return _rd(v[name], halo[name] - 2, R, off, 0.0)

        def emit(prod, off):
            # (TX, *plane) out-rows view of prod shifted by -off
            xs = (BO - BT) - off[0]
            w = prod[xs:xs + TX]
            w = _sh_yz(w, 1, -off[1], 0.0)
            w = _sh_yz(w, 2, -off[2], 0.0)
            return w

        def emit_blocksum(prod, off, t_axes):
            # out[v] += sum_{w in block(v)} prod[w - off] on out rows
            z = _sh_yz_or_x(prod, 0, -off[0])
            z = _sh_yz(z, 1, -off[1], 0.0)
            z = _sh_yz(z, 2, -off[2], 0.0)
            b = _blocksum_t(z, t_axes, pbase)
            return b[BO - BT:BO - BT + TX]

        acc = {n: None for n in out_names}

        def add(name, contrib):
            acc[name] = (
                contrib if acc[name] is None else acc[name] + contrib
            )

        for a in range(3):
            wtau = val(f"wte{a}")
            for c, uv, off, dest in _edge_terms(
                a, dxw, enhanced, has_parent, kind, val, pbase, False
            ):
                mode, f = dest
                prod = c * wtau
                if mode == "same":
                    add(f"out{f}", emit(prod, off))
                elif mode == "parent":
                    add(f"zp{f}", emit(prod, off))
                else:
                    t_axes = [t for t in range(3) if t != f]
                    add(f"out{f}", emit_blocksum(prod, off, t_axes))

        act_c = _eqf(kind("ck"), FLUID)
        for axis in range(3):
            wtau = val(f"wtc{axis}")
            for c, uv, off, dest in _center_terms(
                axis, dxw, has_child, kind, val, act_c, False
            ):
                prod = c * wtau
                if dest == "same":
                    add(f"out{axis}", emit(prod, off))
                else:
                    add(f"zc{axis}", emit(prod, off))

        # fold the mass term + active mask into the face outputs:
        # out_f = [vk_f == FLUID] * (sum_s c_s wtau_s + m_f u_f).
        # The mask is REQUIRED, not just a hygiene pass: the T5
        # blocksum adjoint distributes onto all 4 inset children of a
        # dangling parent face, including non-FLUID ones.  zp/zc stay
        # unmasked — the caller masks them at the cross-level add.
        for f in range(3):
            g, slot = smap[f"vk{f}"]
            raw = _rd(v[f"kp{g}"], halo[f"kp{g}"], TX, (0, 0, 0),
                      PACK_FILL)
            mask = _eqf(_decode_kind(raw.astype(F32), slot), FLUID)
            mu = v[f"u{f}"][:] * v[f"m{f}"][:]
            base = acc[f"out{f}"]
            acc[f"out{f}"] = (
                mask * (mu if base is None else base + mu)
            )

        return [
            acc[name] if acc[name] is not None
            else jnp.zeros((TX,) + plane, F32)
            for name in out_names
        ]

    kernel = _level_kernel(compute, canon, in_names, out_names)
    return kernel, in_names, out_names


def _fused_input_names(level: int, levels: int):
    """(name, dtype, slab_halo) for the fused (tau+D^T) kernel: stress rows
    span out rows +-2, value reads another +-2 (T2 sibling / T5 blocksum)
    -> halo 4 for stencil-read f32 inputs and the kind grids; weights are
    read on stress rows only (halo 2); mass/u-mass on out rows (halo 0 via
    the u slab)."""
    names = [(f"u{f}", F32, 4) for f in range(3)]
    if level + 1 < levels:
        names += [(f"up{f}", F32, 4) for f in range(3)]
    if level > 0:
        names += [(f"cs{f}", F32, 4) for f in range(3)]
    names += [(f"kp{g}", KIND_DT, 4)
              for g in range(len(_pack_groups(level, levels)))]
    names += [(f"we{a}", F32, 2) for a in range(3)]
    names += [("wc", F32, 2)]
    names += [(f"m{f}", F32, 0) for f in range(3)]
    return names


def _make_fused_body(level: int, levels: int, canon: Canon, dx: float,
                     enhanced: bool, pipelined: bool = False):
    """The fused (tau + D^T) computation for ONE level, as a function of
    the per-level ref lists and a LOCAL program index — shared by the
    single-level kernel and the merged multi-level kernel (which dispatches
    on program-id ranges).

    One pass builds every weighted stress tau in-register AND immediately
    distributes it back onto the velocity faces (tau kernel + D^T kernel
    fused; the CG SpMV hot loop, cpp:611-643).

    Two wins over the split pair: the 6 per-level wtau arrays never touch
    HBM (no write + halo'd re-read), and each stress coefficient is built
    ONCE — the shared per-(face,slot) coefficient planes (q = act*base,
    e = act*enh*base, un = una*base) serve both the tau gather and the D^T
    scatter, where the split kernels re-derived every coefficient twice.
    Term algebra is identical to _edge_terms/_center_terms (equality is
    property-tested against the v1 operator).
    """
    TX = canon.TX
    CX, CY, CZ = canon.shape
    R = TX + 4          # stress rows: out rows +-2
    BT = 2              # first out row within the stress-row window
    dxw = dx * (1 << level)
    in_names = _fused_input_names(level, levels)
    out_names = _dt_output_names(level, levels)
    NOUT = len(out_names)
    has_parent = level + 1 < levels
    has_child = level > 0
    pbase = {0: 0, 1: 0, 2: 0}
    smap = _kind_slot_map(level, levels)

    def body(ins, outs, scratch, sems, i):
        interior = jnp.logical_and(i >= canon.PX, i < canon.PX + canon.K)

        # slab DMA: ``pipelined`` double-buffers the input slabs — every
        # program issues the NEXT interior program's copies into the other
        # slot before computing its own, so the serial DMA wait overlaps
        # with compute (program PX-1, a halo program — PX >= 1 always —
        # issues the first interior program's copies).  Off by default:
        # the traced-slot VMEM indexing it needs measured 16x SLOWER than
        # the single-buffered kernel on v5e (Mosaic can't statically lay
        # out ``scratch[j][slot]``), kept behind AVS_PALLAS_PIPELINE for
        # re-evaluation on other toolchains.
        def copies_for(prog, slot):
            return [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(prog * TX - h, TX + 2 * h)],
                    scratch[j] if slot is None else scratch[j].at[slot],
                    sems.at[j] if slot is None else sems.at[slot, j],
                )
                for j, (_, _, h) in enumerate(in_names)
            ]

        if pipelined:
            nxt = i + 1
            nxt_interior = jnp.logical_and(nxt >= canon.PX,
                                           nxt < canon.PX + canon.K)

            @pl.when(nxt_interior)
            def _():
                for c in copies_for(nxt, jax.lax.rem(nxt, jnp.int32(2))):
                    c.start()

        @pl.when(jnp.logical_not(interior))
        def _():
            for j in range(NOUT):
                outs[j][:] = jnp.zeros((TX, CY, CZ), F32)

        @pl.when(interior)
        def _():
            if pipelined:
                slot = jax.lax.rem(i, jnp.int32(2))
            else:
                slot = None
                for c in copies_for(i, None):
                    c.start()
            for c in copies_for(i, slot):
                c.wait()

            v = {}
            halo = {}
            for j, (name, dt_, h) in enumerate(in_names):
                v[name] = scratch[j][:] if slot is None else scratch[j][slot]
                halo[name] = h

            # stress-row reads: slab row halo-2 covers stress row 0
            def kind(name, off=(0, 0, 0)):
                g, slot = smap[name]
                raw = _rd(v[f"kp{g}"], halo[f"kp{g}"] - 2, R, off, PACK_FILL)
                return _decode_kind(raw.astype(F32), slot)

            # ---- hoisted kind masks: decode each velocity/parent kind grid
            # ONCE into 0/1 float planes on an x-EXPANDED stress window
            # (stress rows +-1), so every term's shifted read is a cheap
            # x-slice + y/z shift of a mask instead of a fresh slab decode +
            # compare chain.  Fill is 0 everywhere: out-of-window reads hold
            # PACK_FILL = OUTSIDE, for which all these masks are 0.
            W = R + 2

            def dec_w(name):
                g, slot = smap[name]
                raw = _rd(v[f"kp{g}"], halo[f"kp{g}"] - 3, W, (0, 0, 0),
                          PACK_FILL)
                return _decode_kind(raw.astype(F32), slot)

            FLU, UNA, NOUT = {}, {}, {}
            PFLU, PUNA = {}, {}
            for f in range(3):
                dw = dec_w(f"vk{f}")
                FLU[f] = _eqf(dw, FLUID)
                UNA[f] = _eqf(dw, UNASSIGNED)
                if enhanced:
                    NOUT[f] = (1.0 - _eqf(dw, OUTSIDE)
                               - _eqf(dw, SOLIDBOUNDARY))
                if has_parent:
                    dp = dec_w(f"pk{f}")
                    PFLU[f] = _eqf(dp, FLUID)
                    PUNA[f] = _eqf(dp, UNASSIGNED)

            def m_at(M, off=(0, 0, 0)):
                w = M[1 + off[0]: 1 + off[0] + R]
                w = _sh_yz(w, 1, off[1], 0.0)
                return _sh_yz(w, 2, off[2], 0.0)

            def val(name, off=(0, 0, 0)):
                return _rd(v[name], halo[name] - 2, R, off, 0.0)

            def valw(name, off=(0, 0, 0)):
                # x-expanded read for the T5 blocksum (one extra row each
                # side keeps odd-aligned block partners in-window)
                return _rd(v[name], halo[name] - 3, R + 2, off, 0.0)

            def t5_blocksum(f, offo):
                t_axes = [t for t in range(3) if t != f]
                pb = {ax: pbase[ax] + offo[ax] for ax in range(3)}
                pbw = dict(pb)
                pbw[0] -= 1
                wide = valw(f"u{f}", offo)
                bsw = _blocksum_t(wide, t_axes, pbw)
                return bsw[1:wide.shape[0] - 1]

            def emit(prod, off):
                # (TX, CY, CZ) out-rows view of prod shifted by -off
                xs = BT - off[0]
                w = prod[xs:xs + TX]
                w = _sh_yz(w, 1, -off[1], 0.0)
                w = _sh_yz(w, 2, -off[2], 0.0)
                return w

            def emit_blocksum(prod, off, t_axes):
                z = _sh_yz_or_x(prod, 0, -off[0])
                z = _sh_yz(z, 1, -off[1], 0.0)
                z = _sh_yz(z, 2, -off[2], 0.0)
                b = _blocksum_t(z, t_axes, pbase)
                return b[BT:BT + TX]

            acc = {n: None for n in out_names}

            def add(name, contrib):
                acc[name] = (
                    contrib if acc[name] is None else acc[name] + contrib
                )

            shape = (R, CY, CZ)
            for a in range(3):
                # ---- shared coefficient planes (built once per axis)
                active_edge = _eqf(kind(f"ek{a}"), FLUID)
                f_axes = [f for f in range(3) if f != a]
                planes = {}
                for f in f_axes:
                    g = 3 - a - f
                    og = _unit(g, -1)
                    una0, una1 = m_at(UNA[f], og), m_at(UNA[f])
                    # binv = 1/(dxw*(1+0.5*(una0+una1))) written as a
                    # polynomial in the 0/1 masks (s=0 -> 1, s=1 -> 2/3,
                    # s=2 -> 1/2) — removes a vector divide per (a, f)
                    binv = (1.0 / dxw) * (
                        1.0 - (una0 + una1) * (1.0 / 3.0)
                        + (una0 * una1) * (1.0 / 6.0)
                    )
                    if enhanced:
                        is_trans = una0 + una1 - una0 * una1
                        enh = is_trans * m_at(NOUT[f], og) * m_at(NOUT[f])
                    for d in (0, 1):
                        sign = -1.0 if d == 0 else 1.0
                        act = (m_at(FLU[f], og) if d == 0
                               else m_at(FLU[f])) * active_edge
                        una = una0 if d == 0 else una1
                        base = sign * binv
                        p = {"q": act * base,
                             "un": una * active_edge * base}
                        if enhanced:
                            p["e"] = act * enh * base
                        planes[(f, d)] = p

                par_even_a = _parity_even_f(shape, a, pbase[a])
                dang_f = {f: 1.0 - _parity_even_f(shape, f, pbase[f])
                          for f in f_axes} if has_parent else {}

                def edge_terms():
                    """(coeff, off, dest, value_fn) per term — cheap combos
                    of the planes; same cases as _edge_terms (T1-T5)."""
                    for f in f_axes:
                        g = 3 - a - f
                        for d in (0, 1):
                            off = _unit(g, -1) if d == 0 else (0, 0, 0)
                            p = planes[(f, d)]
                            if enhanced:
                                c1 = 0.5 * p["q"] - 0.25 * p["e"]
                            else:
                                c1 = 0.5 * p["q"]
                            yield (c1, off, ("same", f),
                                   lambda off=off, f=f: val(f"u{f}", off))
                            if enhanced:
                                par_even = par_even_a
                                for par, so in ((par_even, 1),
                                                (1.0 - par_even, -1)):
                                    o2 = _add(off, _unit(a, so))
                                    yield (0.25 * p["e"] * par, o2,
                                           ("same", f),
                                           lambda o2=o2, f=f: val(f"u{f}", o2))
                            if has_parent:
                                dang = dang_f[f]
                                yield (0.5 * p["un"] * (1.0 - dang), off,
                                       ("parent", f),
                                       lambda off=off, f=f: val(f"up{f}", off))
                                for so in (-1, 1):
                                    offo = _add(off, _unit(f, so))
                                    c4 = (p["un"] * dang * 0.25
                                          * m_at(PFLU[f], offo))
                                    yield (c4, offo, ("parent", f),
                                           lambda offo=offo, f=f:
                                           val(f"up{f}", offo))
                                    c5 = (p["un"] * dang * 0.0625
                                          * m_at(PUNA[f], offo))
                                    yield (c5, offo, ("blocksum", f),
                                           lambda offo=offo, f=f:
                                           t5_blocksum(f, offo))

                # ---- tau gather, then immediate D^T scatter.  Materialize
                # the term list ONCE: each coefficient plane (incl. the
                # T4/T5 parent-kind decodes and parity iotas) is computed a
                # single time and reused by both passes — re-running the
                # generator would rebuild them all, which Mosaic does not
                # CSE across the passes (measured ~25% slower).
                terms = list(edge_terms())
                tau = None
                for c, off, dest, value in terms:
                    contrib = c * value()
                    tau = contrib if tau is None else tau + contrib
                wtau = val(f"we{a}") * tau
                for c, off, dest, value in terms:
                    mode, f = dest
                    prod = c * wtau
                    if mode == "same":
                        add(f"out{f}", emit(prod, off))
                    elif mode == "parent":
                        add(f"zp{f}", emit(prod, off))
                    else:
                        t_axes = [t for t in range(3) if t != f]
                        add(f"out{f}", emit_blocksum(prod, off, t_axes))

            # ---- center stresses (coefficients are trivial; build the
            # per-axis planes once, use for gather + scatter)
            act_c = _eqf(kind("ck"), FLUID)
            wcv = val("wc")
            for axis in range(3):
                cterms = []
                for d in (0, 1):
                    off = (0, 0, 0) if d == 0 else _unit(axis, 1)
                    sign = -1.0 if d == 0 else 1.0
                    c1 = m_at(FLU[axis], off) * act_c * (sign / dxw)
                    cterms.append((c1, off, "same",
                                   lambda off=off: val(f"u{axis}", off)))
                    if has_child:
                        c2 = (m_at(UNA[axis], off) * act_c
                              * (0.25 * sign / dxw))
                        cterms.append((c2, off, "child",
                                       lambda off=off: val(f"cs{axis}", off)))
                tau = None
                for c, off, dest, value in cterms:
                    contrib = c * value()
                    tau = contrib if tau is None else tau + contrib
                wtau = wcv * tau
                for c, off, dest, value in cterms:
                    prod = c * wtau
                    if dest == "same":
                        add(f"out{axis}", emit(prod, off))
                    else:
                        add(f"zc{axis}", emit(prod, off))

            # ---- mass term + active mask (same contract as the split D^T
            # kernel: out_f = [vk_f == FLUID] * (sum + m_f u_f); zp/zc stay
            # unmasked — the caller masks at the cross-level add)
            for f in range(3):
                # FLU is on the x-expanded stress window: out rows start at
                # expanded row 3 (= stress row 2 = slab row halo - 2 + 2)
                mask = FLU[f][3:3 + TX]
                mu = (v[f"u{f}"][halo[f"u{f}"]:halo[f"u{f}"] + TX]
                      * v[f"m{f}"][:])
                base = acc[f"out{f}"]
                acc[f"out{f}"] = (
                    mask * (mu if base is None else base + mu)
                )

            for j, name in enumerate(out_names):
                val_out = acc[name]
                if val_out is None:
                    val_out = jnp.zeros((TX, CY, CZ), F32)
                outs[j][:] = val_out

    return body


def _make_fused_kernel(level: int, levels: int, canon: Canon, dx: float,
                       enhanced: bool, pipelined: bool = False):
    """Single-level fused kernel: one pallas program per level (see
    :func:`_make_fused_body` for the computation)."""
    in_names = _fused_input_names(level, levels)
    out_names = _dt_output_names(level, levels)
    NIN, NOUT = len(in_names), len(out_names)
    body = _make_fused_body(level, levels, canon, dx, enhanced, pipelined)

    def kernel(*refs):
        body(refs[:NIN], refs[NIN:NIN + NOUT],
             refs[NIN + NOUT:NIN + NOUT + NIN],
             refs[NIN + NOUT + NIN], pl.program_id(0))

    return kernel, in_names, out_names


def _env_flag(name: str, default: str = "0") -> bool:
    import os

    return os.environ.get(name, default) == "1"


def _glue_mode() -> str:
    """Cross-level glue lowering: "mm" (default) | "c2c" | "old"."""
    import os

    mode = os.environ.get("AVS_PALLAS_GLUE", "mm")
    if mode not in ("mm", "c2c", "old"):
        raise ValueError(f"AVS_PALLAS_GLUE must be mm|c2c|old, got {mode}")
    return mode


# Both A/B env knobs are resolved ONCE at import: they select among
# lowerings that end up inside lru_cache'd pallas_calls and jitted CG
# programs whose cache keys do not carry them, so a mid-process toggle
# would silently reuse stale compiled kernels (an A/B could compare two
# copies of the same lowering).  Import-time resolution makes the knobs
# per-process — exactly how the profiling tools use them.
_PIPELINED = _env_flag("AVS_PALLAS_PIPELINE")
_GLUE = _glue_mode()


def _merge_mode() -> str:
    """Level-merge policy: "coarse" (default) | "all" | "off"."""
    import os

    mode = os.environ.get("AVS_PALLAS_MERGE", "coarse")
    if mode not in ("coarse", "all", "off"):
        raise ValueError(f"AVS_PALLAS_MERGE must be coarse|all|off, got {mode}")
    return mode


_MERGE = _merge_mode()


@functools.lru_cache(maxsize=None)
def _compiled_fused_call(level: int, levels: int, canon: Canon, dx: float,
                         enhanced: bool, interpret: bool):
    pipelined = _PIPELINED
    fk, fin, fout = _make_fused_kernel(level, levels, canon, dx, enhanced,
                                       pipelined)
    return (
        _pallas_level_call(fk, fin, fout, canon, interpret,
                           pipelined=pipelined),
        fin, fout,
    )


# ---------------------------------------------------------------------------
# merged multi-level kernel: several levels' fused bodies in ONE pallas_call
# ---------------------------------------------------------------------------
#
# Measured (docs/perf_notes.md round 5): each pallas_call pays a ~0.10-0.13
# ms floor that neither tile shape nor DMA count explains — launch/dispatch
# cost.  The coarse levels of a 4-level apply are 3 calls paying that floor
# on 1/8..1/512-scale data, so their bodies are dispatched on program-id
# ranges of ONE call instead: grid = sum of per-level grids, each program
# runs exactly one level's body (the bodies are identical to the
# single-level kernel's — :func:`_make_fused_body`).
#
# Outputs use a trash-block scheme: each output grows one x-tile of scrap
# rows at EACH end, and its index map clamps out-of-range programs to the
# scrap blocks (pure min/max arithmetic — block 0 below the range, block
# K+1 above), so programs of other levels never touch real rows; the caller
# slices the scrap off.


def _make_merged_kernel(levels_cfg, levels: int, dx: float, enhanced: bool):
    """One kernel running each level of ``levels_cfg`` ((level, canon)
    pairs) on its own program-id range."""
    metas = []
    for level, canon in levels_cfg:
        fin = _fused_input_names(level, levels)
        fout = _dt_output_names(level, levels)
        body = _make_fused_body(level, levels, canon, dx, enhanced, False)
        metas.append((level, canon, fin, fout, body))

    def kernel(*refs):
        pos = 0
        ins_by, outs_by, scr_by = [], [], []
        for _, _, fin, _, _ in metas:
            ins_by.append(refs[pos:pos + len(fin)])
            pos += len(fin)
        for _, _, _, fout, _ in metas:
            outs_by.append(refs[pos:pos + len(fout)])
            pos += len(fout)
        for _, _, fin, _, _ in metas:
            scr_by.append(refs[pos:pos + len(fin)])
            pos += len(fin)
        sems_by = refs[pos:pos + len(metas)]

        gi = pl.program_id(0)
        start = 0
        for li, (level, canon, fin, fout, body) in enumerate(metas):
            in_range = jnp.logical_and(gi >= start, gi < start + canon.grid)

            @pl.when(in_range)
            def _(li=li, body=body, start=start):
                body(ins_by[li], outs_by[li], scr_by[li], sems_by[li],
                     gi - start)

            start += canon.grid

    return kernel, metas


def _merged_call(kernel, metas, interpret: bool):
    grid_total = sum(canon.grid for _, canon, _, _, _ in metas)
    in_specs, out_specs, out_shape, scratch = [], [], [], []
    start = 0
    for _, canon, fin, fout, _ in metas:
        TX = canon.TX
        CX, CY, CZ = canon.shape
        K = canon.grid
        in_specs += [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * len(fin)

        def imap(i, s=start, K=K):
            # real blocks 1..K; 0 / K+1 are scrap for out-of-range programs
            return (jnp.clip(i - s + 1, 0, K + 1), 0, 0)

        out_specs += [
            pl.BlockSpec((TX, CY, CZ), imap, memory_space=pltpu.VMEM)
            for _ in fout
        ]
        out_shape += [
            jax.ShapeDtypeStruct((CX + 2 * TX, CY, CZ), F32) for _ in fout
        ]
        start += K
    for _, canon, fin, _, _ in metas:
        TX = canon.TX
        _, CY, CZ = canon.shape
        scratch += [pltpu.VMEM((TX + 2 * h, CY, CZ), dt) for _, dt, h in fin]
    scratch += [pltpu.SemaphoreType.DMA((len(fin),))
                for _, _, fin, _, _ in metas]
    return pl.pallas_call(
        kernel,
        grid=(grid_total,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
        ),
    )


@functools.lru_cache(maxsize=None)
def _compiled_merged_call(levels_cfg, levels: int, dx: float, enhanced: bool,
                          interpret: bool):
    kernel, metas = _make_merged_kernel(levels_cfg, levels, dx, enhanced)
    call = _merged_call(kernel, metas, interpret)
    return call, metas


def _slab_bytes(level: int, levels: int, canon: Canon) -> int:
    """Static VMEM held by one level's input slabs in a merged call."""
    _, CY, CZ = canon.shape
    total = 0
    for _, dt, h in _fused_input_names(level, levels):
        total += (canon.TX + 2 * h) * CY * CZ * jnp.dtype(dt).itemsize
    return total


def _merge_plan(fused_levels, canons, levels, margin: float = 0.9):
    """Group fused-mode levels for merged calls.

    ``AVS_PALLAS_MERGE`` (import-resolved, like the other A/B knobs):
    "coarse" (default) merges levels >= 1 and keeps level 0 on its own
    call; "all" merges every fused level; "off" keeps per-level calls.
    A group only forms when its projected VMEM fits: the largest member's
    fused liveness plus the other members' static slabs (the bodies are
    program-id-exclusive, so Mosaic temporaries don't sum — input slab
    buffers do)."""
    if _MERGE == "off" or len(fused_levels) < 2:
        return [[l] for l in fused_levels]
    if _MERGE == "all":
        cand = [list(fused_levels)]
    else:
        cand = ([[l] for l in fused_levels if l == 0]
                + [[l for l in fused_levels if l > 0]])
    groups = []
    for g in cand:
        if len(g) < 2:
            groups.append(g)
            continue
        live = max(
            _MEASURED_VMEM_BYTES
            * (canons[l].shape[1] * canons[l].shape[2]) / _MEASURED_PLANE
            for l in g
        )
        slabs = sum(_slab_bytes(l, levels, canons[l]) for l in g)
        if live + slabs <= margin * VMEM_LIMIT:
            groups.append(g)
        else:
            groups.extend([l] for l in g)
    return groups


# The fused kernel's VMEM liveness scales with the full canonical y*z
# plane (whole-plane slabs; docs/perf_notes.md records why every tiled
# layout lost).  Measured: ~53 MB total liveness at the 96^3 level-0 canon
# (plane 112*128 = 14336 f32 elements) — static slabs are ~11 MB of that,
# the rest is Mosaic temporaries from the fully unrolled stencil, and both
# scale linearly with the plane.  Above the plane budget the fused kernel
# cannot compile, so callers must route those solves to the whole-array
# XLA operator (solver resolves apply_impl='auto' through fits_vmem).
_MEASURED_VMEM_BYTES = 53 * 1024 * 1024
# The SPLIT tau/D^T pair holds roughly half the unrolled stencil per
# program: the tau kernel measured 21.67 MB at the same TX=4 96^3 plane
# (docs/perf_notes.md "dual x-tiling"), D^T comparable — so levels whose
# plane overflows the fused budget can still run Pallas through the split
# pair (wtau pays one HBM round trip) up to ~2.4x larger planes.
_MEASURED_SPLIT_VMEM_BYTES = 22 * 1024 * 1024
_MEASURED_PLANE = 112 * 128


def fused_vmem_estimate(res, bbox=None, split: bool = False) -> int:
    """Projected per-kernel VMEM liveness (bytes) for one level's fused
    (or split-pair) program, linear in the canonical y*z plane area."""
    c = make_canon(res, bbox=bbox)
    plane = c.shape[1] * c.shape[2]
    base = _MEASURED_SPLIT_VMEM_BYTES if split else _MEASURED_VMEM_BYTES
    return int(base * plane / _MEASURED_PLANE)


def brick_vmem_estimate(res, ty: int, bbox=None) -> int:
    """Projected VMEM liveness of one y-bricked SPLIT program: the split
    model scaled to the brick plane, plus the manual-DMA out buffers."""
    c = make_canon(res, bbox=bbox, ty=ty)
    brick_plane = (ty + 16) * c.shape[2]
    est = int(_MEASURED_SPLIT_VMEM_BYTES * brick_plane / _MEASURED_PLANE)
    est += 9 * c.TX * brick_plane * 4  # out scratch (<= 9 outputs)
    return est


BRICK_SIZES = (96, 64, 32)  # multiples of 32 (int8 sublane tile)


def level_modes(res_per_level, bboxes=None, margin: float = 0.9):
    """Per-level Pallas lowering choice by projected VMEM liveness:
    ``"fused"`` (one kernel, wtau never in HBM), ``"split"`` (tau + D^T
    pair — ~2.4x smaller liveness, one wtau HBM round trip),
    ``("brick", TY)`` (split pair on y-bricks of TY rows — liveness
    independent of the y extent, unlocks arbitrarily large planes at a
    1.5-2x y halo reread), or ``None`` (no Pallas program fits; the solve
    must fall back to the whole-array operator — only reachable for
    extreme z extents now).  ``margin`` keeps headroom against the linear
    model — a false pass is a Mosaic compile failure, a false fail costs
    speed."""
    modes = []
    for l, res in enumerate(res_per_level):
        bb = None if bboxes is None else bboxes[l]
        if fused_vmem_estimate(res, bb) <= margin * VMEM_LIMIT:
            modes.append("fused")
        elif fused_vmem_estimate(res, bb, split=True) <= margin * VMEM_LIMIT:
            modes.append("split")
        else:
            for ty in BRICK_SIZES:
                if brick_vmem_estimate(res, ty, bb) <= margin * VMEM_LIMIT:
                    modes.append(("brick", ty))
                    break
            else:
                modes.append(None)
    return modes


def fits_vmem(res_per_level, bboxes=None, margin: float = 0.9) -> bool:
    """Whether SOME Pallas lowering (fused or split) is projected to fit
    the VMEM cap on every level."""
    return all(m is not None
               for m in level_modes(res_per_level, bboxes, margin))


VMEM_LIMIT = 116 * 1024 * 1024  # v5e has 128 MB physical VMEM; the XLA
# default scoped-vmem cap is 16 MB, far below what one core can use.  The
# fused kernel's cross-pass coefficient liveness (~31 MB at 96^3) and the
# TX>=4 layouts (~22 MB) fit at 100 MB; TX=12 (the next stress-row-aligned
# tile) needs ~105 MB at 96^3, so the cap sits just under the hardware.


def _pallas_level_call(kernel, in_names, out_names, canon: Canon,
                       interpret: bool, pipelined: bool = False):
    TX = canon.TX
    CX, CY, CZ = canon.shape
    NIN = len(in_names)
    if canon.TY is not None:
        # y-brick protocol: 2D (x, y-brick) grid, HBM outputs written by
        # manual DMA (see _level_kernel)
        BY = canon.TY + 16
        scratch = [
            pltpu.VMEM((TX + 2 * h, BY, CZ), dt) for _, dt, h in in_names
        ] + [pltpu.VMEM((TX, BY, CZ), F32) for _ in out_names] + [
            pltpu.SemaphoreType.DMA((NIN,)),
            pltpu.SemaphoreType.DMA((len(out_names), 3)),
        ]
        return pl.pallas_call(
            kernel,
            grid=(canon.grid, canon.KY),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * NIN,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                for _ in out_names
            ],
            out_shape=[
                jax.ShapeDtypeStruct((CX, CY, CZ), F32) for _ in out_names
            ],
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT,
            ),
        )
    if pipelined:
        # double-buffered input slabs + per-slot DMA semaphores
        scratch = [
            pltpu.VMEM((2, TX + 2 * h, CY, CZ), dt) for _, dt, h in in_names
        ] + [pltpu.SemaphoreType.DMA((2, NIN))]
    else:
        scratch = [
            pltpu.VMEM((TX + 2 * h, CY, CZ), dt) for _, dt, h in in_names
        ] + [pltpu.SemaphoreType.DMA((NIN,))]
    return pl.pallas_call(
        kernel,
        grid=(canon.grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * NIN,
        out_specs=[
            pl.BlockSpec((TX, CY, CZ), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in out_names
        ],
        out_shape=[
            jax.ShapeDtypeStruct((CX, CY, CZ), F32) for _ in out_names
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
        ),
    )


@functools.lru_cache(maxsize=None)
def _compiled_level_calls(level: int, levels: int, canon: Canon, dx: float,
                          enhanced: bool, interpret: bool):
    tk, tin, tout = _make_tau_kernel(level, levels, canon, dx, enhanced)
    dk, din, dout = _make_dt_kernel(level, levels, canon, dx, enhanced)
    tau_call = _pallas_level_call(tk, tin, tout, canon, interpret)
    dt_call = _pallas_level_call(dk, din, dout, canon, interpret)
    return (tau_call, tin, tout), (dt_call, din, dout)


# ---------------------------------------------------------------------------
# per-frame data + the operator
# ---------------------------------------------------------------------------


def build_frame_data(
    labels: Sequence[jnp.ndarray],
    vel_kinds,
    edge_kinds,
    center_kinds,
    blocks,
    mass: UField,
    res_per_level,
    force_tx: int | None = None,
    bboxes=None,
    modes=None,
):
    """Embed the per-frame loop-invariant arrays into canonical boxes.

    Kind grids go in bit-packed (3 grids per int8, 2-bit codes = -kind) —
    see :func:`_pack_groups`.  ``bboxes`` (per level, from the host-side
    occupancy probe) crops each canonical box to the occupied region.
    ``modes`` (from :func:`level_modes`) switches levels routed
    ``("brick", TY)`` to the y-brick canonical layout."""
    levels = len(res_per_level)
    canons = [
        make_canon(
            res_per_level[l], force_tx,
            None if bboxes is None else bboxes[l],
            ty=(modes[l][1]
                if modes is not None and isinstance(modes[l], tuple)
                else None),
        )
        for l in range(levels)
    ]
    data: Dict[str, jnp.ndarray] = {}
    for l in range(levels):
        c = canons[l]
        kinds: Dict[str, jnp.ndarray] = {}
        for f in range(3):
            kinds[f"vk{f}"] = vel_kinds[l][f]
            data[f"m{f}_{l}"] = embed(mass[(l, f)].astype(F32), c, 0.0)
        for a in range(3):
            kinds[f"ek{a}"] = edge_kinds[l][a]
        kinds["ck"] = center_kinds[l]
        if l + 1 < levels:
            for f in range(3):
                fsh = face_shape(res_per_level[l], f)
                kinds[f"pk{f}"] = upread(vel_kinds[l + 1][f], fsh)
        for g, group in enumerate(_pack_groups(l, levels)):
            packed = None
            for slot, name in enumerate(group):
                code = embed((-kinds[name]).astype(jnp.int32), c, 3)
                term = code << (2 * slot)
                packed = term if packed is None else packed | term
            # unused high slots of a short group read as OUTSIDE
            for slot in range(len(group), 3):
                packed = packed | (3 << (2 * slot))
            data[f"kp{g}_{l}"] = packed.astype(KIND_DT)
    for b in blocks:
        if b.kind == "edge":
            data[f"we{b.axis}_{b.level}"] = embed(
                b.weight.astype(F32), canons[b.level], 0.0
            )
        elif f"wc_{b.level}" not in data:
            data[f"wc_{b.level}"] = embed(
                b.weight.astype(F32), canons[b.level], 0.0
            )
    return data, canons


def make_pallas_operator(
    frame: Dict[str, jnp.ndarray],
    canons: Sequence[Canon],
    active: UField,
    res_per_level,
    dx: float,
    enhanced: bool,
    interpret: bool = False,
    fused=True,
):
    """Return (apply_A, embed_tree, crop_tree) in canonical space.

    ``fused=True`` (default) runs ONE kernel per level (tau + D^T in a
    single pass, wtau never touches HBM); ``False`` keeps the split
    tau/D^T kernel pair (useful for profiling comparisons, and ~2.4x
    smaller VMEM liveness for planes past the fused wall).  A per-level
    sequence of "fused"/"split" mixes the two — :func:`level_modes`
    computes the VMEM-driven choice."""
    levels = len(res_per_level)
    if isinstance(fused, bool):
        fused_l = ["fused" if fused else "split"] * levels
    else:
        fused_l = list(fused)
        if not all(
            m in ("fused", "split") or (isinstance(m, tuple) and m[0] == "brick")
            for m in fused_l
        ):
            raise ValueError(
                f"no Pallas lowering fits VMEM on some level: {fused_l}; "
                "use apply_impl='v1-fused' (or 'auto') for this size"
            )
        for l, m in enumerate(fused_l):
            if isinstance(m, tuple) and canons[l].TY != m[1]:
                raise ValueError(
                    f"level {l} routed ('brick', {m[1]}) but its canon has "
                    f"TY={canons[l].TY}; pass the same modes to "
                    "build_frame_data"
                )
    merge_groups = _merge_plan(
        [l for l in range(levels) if fused_l[l] == "fused"],
        canons, levels,
    )
    active_c = {
        (l, f): embed(active[(l, f)], canons[l], False)
        for l in range(levels)
        for f in range(3)
    }

    def fshape(l, f):
        return face_shape(res_per_level[l], f)

    def embed_tree(u: UField, fill=0.0) -> UField:
        return {
            (l, f): embed(u[(l, f)].astype(F32), canons[l], fill)
            for (l, f) in u
        }

    def crop_tree(u: UField) -> UField:
        return {
            (l, f): crop(u[(l, f)], canons[l], fshape(l, f))
            for (l, f) in u
        }

    def apply_A(u: UField) -> UField:
        # cross-level views: AVS_PALLAS_GLUE picks the lowering —
        #   "mm"  (default): canonical-to-canonical with MXU-matmul y/z
        #         interleaves (fastest measured on v5e)
        #   "c2c": canonical-to-canonical broadcast+reshape interleaves
        #         (lane-shuffle lowering: 34.9 ms/apply at 96^3 — kept only
        #         for comparison)
        #   "old": logical-shape round trips (crop -> repeat chains ->
        #         embed; the round-3 shipped glue, ~0.9 ms/apply)
        glue = _GLUE  # per-process constant (see note at definition)
        extras: Dict[str, jnp.ndarray] = {}
        for l in range(levels):
            if l + 1 < levels:
                for f in range(3):
                    if glue == "mm":
                        extras[f"up{f}_{l}"] = up_view_mm(
                            u[(l + 1, f)], canons[l + 1], canons[l]
                        )
                    elif glue == "c2c":
                        extras[f"up{f}_{l}"] = up_view_c2c(
                            u[(l + 1, f)], canons[l + 1], canons[l]
                        )
                    else:
                        cu = crop(u[(l + 1, f)], canons[l + 1],
                                  fshape(l + 1, f))
                        extras[f"up{f}_{l}"] = embed(
                            upread(cu, fshape(l, f)), canons[l], 0.0
                        )
            if l > 0:
                for f in range(3):
                    if glue == "mm":
                        extras[f"cs{f}_{l}"] = cs_view_mm(
                            u[(l - 1, f)], canons[l - 1], canons[l], f
                        )
                    elif glue == "c2c":
                        extras[f"cs{f}_{l}"] = cs_view_c2c(
                            u[(l - 1, f)], canons[l - 1], canons[l], f
                        )
                    else:
                        fu = crop(u[(l - 1, f)], canons[l - 1],
                                  fshape(l - 1, f))
                        extras[f"cs{f}_{l}"] = embed(
                            face_child_sum(fu, f, fshape(l, f)),
                            canons[l], 0.0
                        )

        outs: Dict[Tuple[int, int], jnp.ndarray] = {}
        zps: Dict[Tuple[int, int], jnp.ndarray] = {}
        zcs: Dict[Tuple[int, int], jnp.ndarray] = {}

        def arg_for_level(l, name):
            if name.startswith("u") and not name.startswith("up"):
                return u[(l, int(name[1]))]
            if name.startswith("up") or name.startswith("cs"):
                return extras[f"{name}_{l}"]
            return frame[f"{name}_{l}"]

        def route(l, name, r):
            if name.startswith("out"):
                outs[(l, int(name[3]))] = r
            elif name.startswith("zp"):
                zps[(l, int(name[2]))] = r
            else:
                zcs[(l, int(name[2]))] = r

        # merged groups first: every level of a group runs inside ONE
        # pallas_call (per-call floor paid once); singleton groups and
        # split levels use the per-level calls below
        merged_levels = set()
        for group in merge_groups:
            if len(group) < 2:
                continue
            merged_levels.update(group)
            cfg = tuple(
                (l, dataclasses.replace(canons[l], org=(0, 0, 0)))
                for l in group
            )
            call, metas = _compiled_merged_call(
                cfg, levels, dx, enhanced, interpret
            )
            args = []
            for l, _, fin, _, _ in metas:
                args += [arg_for_level(l, n) for n, _, _ in fin]
            res = call(*args)
            idx = 0
            for l, kcanon, _, fout, _ in metas:
                for name in fout:
                    # slice the scrap x-tiles off (trash-block scheme)
                    r = res[idx][kcanon.TX:kcanon.TX + kcanon.shape[0]]
                    route(l, name, r)
                    idx += 1

        for l in range(levels):
            if l in merged_levels:
                continue

            def arg_for(name, l=l):
                return arg_for_level(l, name)

            # the kernel body depends on the canonical SHAPE only, not the
            # crop origin: normalize org so bbox shifts reuse compiled calls
            kcanon = dataclasses.replace(canons[l], org=(0, 0, 0))
            if fused_l[l] == "fused":
                f_call, fin, dout = _compiled_fused_call(
                    l, levels, kcanon, dx, enhanced, interpret
                )
                res = f_call(*[arg_for(n) for n, _, _ in fin])
            else:
                (tau_call, tin, _), (dt_call, din, dout) = _compiled_level_calls(
                    l, levels, kcanon, dx, enhanced, interpret
                )
                wts = tau_call(*[arg_for(n) for n, _, _ in tin])
                dt_args = []
                for name, _, _ in din:
                    if name.startswith("wte"):
                        dt_args.append(wts[int(name[3])])
                    elif name.startswith("wtc"):
                        dt_args.append(wts[3 + int(name[3])])
                    elif name.startswith("u"):
                        dt_args.append(u[(l, int(name[1]))])
                    else:
                        dt_args.append(frame[f"{name}_{l}"])
                res = dt_call(*dt_args)
            for name, r in zip(dout, res):
                route(l, name, r)

        # cross-level adjoints, masked at the add: zp/zc leave the kernels
        # unmasked and may distribute onto non-FLUID faces.  The per-level
        # out arrays are already mass-added and masked in-kernel.
        for (l, f), zp in zps.items():
            if glue == "mm":
                up_adj = up_adjoint_mm(zp, canons[l], canons[l + 1])
            elif glue == "c2c":
                up_adj = up_adjoint_c2c(zp, canons[l], canons[l + 1])
            else:
                zl = crop(zp, canons[l], fshape(l, f))
                up_adj = embed(
                    upread_adjoint(zl, fshape(l + 1, f)), canons[l + 1], 0.0
                )
            outs[(l + 1, f)] = outs[(l + 1, f)] + jnp.where(
                active_c[(l + 1, f)], up_adj, 0.0,
            )
        for (l, f), zc in zcs.items():
            if glue == "mm":
                cs_adj = cs_adjoint_mm(zc, canons[l], canons[l - 1], f)
            elif glue == "c2c":
                cs_adj = cs_adjoint_c2c(zc, canons[l], canons[l - 1], f)
            else:
                zl = crop(zc, canons[l], fshape(l, f))
                cs_adj = embed(
                    face_child_sum_adjoint(zl, f, fshape(l - 1, f)),
                    canons[l - 1], 0.0
                )
            outs[(l - 1, f)] = outs[(l - 1, f)] + jnp.where(
                active_c[(l - 1, f)], cs_adj, 0.0,
            )

        return outs

    return apply_A, embed_tree, crop_tree
