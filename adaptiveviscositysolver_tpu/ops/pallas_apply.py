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
    ``org=(0,0,0)`` and a full-extent window this is the identity layout."""

    res: Tuple[int, int, int]   # cell resolution of the level (full grid)
    TX: int                     # x tile size (even)
    K: int                      # number of interior x tiles
    PX: int                     # pad tiles on EACH side of x
    shape: Tuple[int, int, int]  # canonical array shape
    org: Tuple[int, int, int] = (0, 0, 0)  # logical cell origin (all even)

    @property
    def off(self) -> Tuple[int, int, int]:
        return (self.PX * self.TX, 4, 4)

    @property
    def grid(self) -> int:
        return self.K + 2 * self.PX

    @property
    def cap(self) -> Tuple[int, int, int]:
        """Logical capacity of the window (rows available per axis)."""
        return (self.K * self.TX,
                self.shape[1] - 8,
                self.shape[2] - 8)


def make_canon(res: Sequence[int], force_tx: int | None = None,
               bbox: Optional[Tuple[Tuple[int, int], ...]] = None) -> Canon:
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
    cy = -(-(ny + 1 + 8) // 8) * 8
    cz = -(-(nz + 1 + 8) // 128) * 128
    shape = ((K + 2 * PX) * TX, cy, cz)
    return Canon(tuple(res), TX, K, PX, shape, org)


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

    def kernel(*refs):
        ins = refs[:NIN]
        outs = refs[NIN:NIN + NOUT]
        scratch = refs[NIN + NOUT:NIN + NOUT + NIN]
        sems = refs[NIN + NOUT + NIN]

        # programs 0 and K+1 own the halo blocks: zero them so every row of
        # the output buffers is defined (downstream slabs read the halo)
        i = pl.program_id(0)
        interior = jnp.logical_and(i >= canon.PX, i < canon.PX + canon.K)

        @pl.when(jnp.logical_not(interior))
        def _():
            for j in range(NOUT):
                outs[j][:] = jnp.zeros((TX, CY, CZ), F32)

        @pl.when(interior)
        def _():
            copies = [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(i * TX - h, TX + 2 * h)], scratch[j],
                    sems.at[j]
                )
                for j, (_, _, h) in enumerate(in_names)
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            v = {}
            halo = {}
            for j, (name, dt, h) in enumerate(in_names):
                v[name] = scratch[j][:]
                halo[name] = h

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

            for a in range(3):
                tau = None
                for c, uv, off, dest in _edge_terms(
                    a, dxw, enhanced, has_parent, kind, val, pbase, True,
                    valw=valw,
                ):
                    contrib = c * uv
                    tau = contrib if tau is None else tau + contrib
                outs[a][:] = val(f"we{a}") * tau

            act_c = _eqf(kind("ck"), FLUID)
            wcv = val("wc")
            for axis in range(3):
                tau = None
                for c, uv, off, dest in _center_terms(
                    axis, dxw, has_child, kind, val, act_c, True
                ):
                    contrib = c * uv
                    tau = contrib if tau is None else tau + contrib
                outs[3 + axis][:] = wcv * tau

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

    def kernel(*refs):
        ins = refs[:NIN]
        outs = refs[NIN:NIN + NOUT]
        scratch = refs[NIN + NOUT:NIN + NOUT + NIN]
        sems = refs[NIN + NOUT + NIN]

        i = pl.program_id(0)
        interior = jnp.logical_and(i >= canon.PX, i < canon.PX + canon.K)

        @pl.when(jnp.logical_not(interior))
        def _():
            for j in range(NOUT):
                outs[j][:] = jnp.zeros((TX, CY, CZ), F32)

        @pl.when(interior)
        def _():
            copies = [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(i * TX - h, TX + 2 * h)], scratch[j],
                    sems.at[j]
                )
                for j, (_, _, h) in enumerate(in_names)
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            v = {}
            halo = {}
            for j, (name, dt, h) in enumerate(in_names):
                v[name] = scratch[j][:]
                halo[name] = h

            # product rows span out rows +-2: base = slab_halo - 2
            def kind(name, off=(0, 0, 0)):
                g, slot = smap[name]
                raw = _rd(v[f"kp{g}"], halo[f"kp{g}"] - 2, R, off,
                          PACK_FILL)
                return _decode_kind(raw.astype(F32), slot)

            def val(name, off=(0, 0, 0)):
                return _rd(v[name], halo[name] - 2, R, off, 0.0)

            def emit(prod, off):
                # (TX, CY, CZ) out-rows view of prod shifted by -off
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

            for j, name in enumerate(out_names):
                val_out = acc[name]
                if val_out is None:
                    val_out = jnp.zeros((TX, CY, CZ), F32)
                outs[j][:] = val_out

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


def _make_fused_kernel(level: int, levels: int, canon: Canon, dx: float,
                       enhanced: bool):
    """One kernel per level: build every weighted stress tau in-register AND
    immediately distribute it back onto the velocity faces (tau kernel + D^T
    kernel fused; the CG SpMV hot loop, cpp:611-643).

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
    NIN, NOUT = len(in_names), len(out_names)
    has_parent = level + 1 < levels
    has_child = level > 0
    pbase = {0: 0, 1: 0, 2: 0}
    smap = _kind_slot_map(level, levels)

    def kernel(*refs):
        ins = refs[:NIN]
        outs = refs[NIN:NIN + NOUT]
        scratch = refs[NIN + NOUT:NIN + NOUT + NIN]
        sems = refs[NIN + NOUT + NIN]

        i = pl.program_id(0)
        interior = jnp.logical_and(i >= canon.PX, i < canon.PX + canon.K)

        @pl.when(jnp.logical_not(interior))
        def _():
            for j in range(NOUT):
                outs[j][:] = jnp.zeros((TX, CY, CZ), F32)

        @pl.when(interior)
        def _():
            copies = [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(i * TX - h, TX + 2 * h)], scratch[j],
                    sems.at[j]
                )
                for j, (_, _, h) in enumerate(in_names)
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            v = {}
            halo = {}
            for j, (name, dt_, h) in enumerate(in_names):
                v[name] = scratch[j][:]
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

    return kernel, in_names, out_names


@functools.lru_cache(maxsize=None)
def _compiled_fused_call(level: int, levels: int, canon: Canon, dx: float,
                         enhanced: bool, interpret: bool):
    fk, fin, fout = _make_fused_kernel(level, levels, canon, dx, enhanced)
    return _pallas_level_call(fk, fin, fout, canon, interpret), fin, fout


VMEM_LIMIT = 116 * 1024 * 1024  # v5e has 128 MB physical VMEM; the XLA
# default scoped-vmem cap is 16 MB, far below what one core can use.  The
# fused kernel's cross-pass coefficient liveness (~31 MB at 96^3) and the
# TX>=4 layouts (~22 MB) fit at 100 MB; TX=12 (the next stress-row-aligned
# tile) needs ~105 MB at 96^3, so the cap sits just under the hardware.


def _pallas_level_call(kernel, in_names, out_names, canon: Canon,
                       interpret: bool):
    TX = canon.TX
    CX, CY, CZ = canon.shape
    NIN = len(in_names)
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
        scratch_shapes=[
            pltpu.VMEM((TX + 2 * h, CY, CZ), dt) for _, dt, h in in_names
        ] + [pltpu.SemaphoreType.DMA((NIN,))],
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
):
    """Embed the per-frame loop-invariant arrays into canonical boxes.

    Kind grids go in bit-packed (3 grids per int8, 2-bit codes = -kind) —
    see :func:`_pack_groups`.  ``bboxes`` (per level, from the host-side
    occupancy probe) crops each canonical box to the occupied region."""
    levels = len(res_per_level)
    canons = [
        make_canon(res_per_level[l], force_tx,
                   None if bboxes is None else bboxes[l])
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
    fused: bool = True,
):
    """Return (apply_A, embed_tree, crop_tree) in canonical space.

    ``fused=True`` (default) runs ONE kernel per level (tau + D^T in a
    single pass, wtau never touches HBM); ``False`` keeps the split
    tau/D^T kernel pair (useful for profiling comparisons)."""
    levels = len(res_per_level)
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
        # cross-level views (XLA): fine-shaped parent reads, coarse child sums
        extras: Dict[str, jnp.ndarray] = {}
        for l in range(levels):
            if l + 1 < levels:
                for f in range(3):
                    cu = crop(u[(l + 1, f)], canons[l + 1], fshape(l + 1, f))
                    extras[f"up{f}_{l}"] = embed(
                        upread(cu, fshape(l, f)), canons[l], 0.0
                    )
            if l > 0:
                for f in range(3):
                    fu = crop(u[(l - 1, f)], canons[l - 1], fshape(l - 1, f))
                    extras[f"cs{f}_{l}"] = embed(
                        face_child_sum(fu, f, fshape(l, f)), canons[l], 0.0
                    )

        outs: Dict[Tuple[int, int], jnp.ndarray] = {}
        zps: Dict[Tuple[int, int], jnp.ndarray] = {}
        zcs: Dict[Tuple[int, int], jnp.ndarray] = {}
        for l in range(levels):

            def arg_for(name):
                if name.startswith("u") and not name.startswith("up"):
                    return u[(l, int(name[1]))]
                if name.startswith("up") or name.startswith("cs"):
                    return extras[f"{name}_{l}"]
                return frame[f"{name}_{l}"]

            # the kernel body depends on the canonical SHAPE only, not the
            # crop origin: normalize org so bbox shifts reuse compiled calls
            kcanon = dataclasses.replace(canons[l], org=(0, 0, 0))
            if fused:
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
                if name.startswith("out"):
                    outs[(l, int(name[3]))] = r
                elif name.startswith("zp"):
                    zps[(l, int(name[2]))] = r
                else:
                    zcs[(l, int(name[2]))] = r

        # cross-level adjoints (XLA), masked at the add: zp/zc leave the
        # kernels unmasked and may distribute onto non-FLUID faces.  The
        # per-level out arrays are already mass-added and masked in-kernel.
        for (l, f), zp in zps.items():
            zl = crop(zp, canons[l], fshape(l, f))
            up_adj = upread_adjoint(zl, fshape(l + 1, f))
            outs[(l + 1, f)] = outs[(l + 1, f)] + jnp.where(
                active_c[(l + 1, f)],
                embed(up_adj, canons[l + 1], 0.0),
                0.0,
            )
        for (l, f), zc in zcs.items():
            zl = crop(zc, canons[l], fshape(l, f))
            cs_adj = face_child_sum_adjoint(zl, f, fshape(l - 1, f))
            outs[(l - 1, f)] = outs[(l - 1, f)] + jnp.where(
                active_c[(l - 1, f)],
                embed(cs_adj, canons[l - 1], 0.0),
                0.0,
            )

        return outs

    return apply_A, embed_tree, crop_tree
