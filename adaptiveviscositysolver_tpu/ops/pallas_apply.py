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


@dataclasses.dataclass(frozen=True)
class Canon:
    """Per-level canonical box: all grid kinds share one padded shape."""

    res: Tuple[int, int, int]   # cell resolution of the level
    TX: int                     # x tile size (even)
    K: int                      # number of x tiles
    shape: Tuple[int, int, int]  # canonical array shape

    @property
    def off(self) -> Tuple[int, int, int]:
        return (self.TX, 4, 4)


def make_canon(res: Sequence[int]) -> Canon:
    nx, ny, nz = res
    TX = 4 if nx >= 64 else 8
    K = -(-(nx + 1) // TX)
    shape = (TX + K * TX + 4, ny + 1 + 8, nz + 1 + 8)
    return Canon(tuple(res), TX, K, shape)


def embed(arr: jnp.ndarray, canon: Canon, fill=0) -> jnp.ndarray:
    ox, oy, oz = canon.off
    sx, sy, sz = arr.shape
    cx, cy, cz = canon.shape
    return jnp.pad(
        arr,
        ((ox, cx - ox - sx), (oy, cy - oy - sy), (oz, cz - oz - sz)),
        constant_values=fill,
    )


def crop(arr: jnp.ndarray, canon: Canon, shape: Sequence[int]) -> jnp.ndarray:
    ox, oy, oz = canon.off
    sx, sy, sz = shape
    return arr[ox:ox + sx, oy:oy + sy, oz:oz + sz]


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


def _parity_even(shape, axis, base: int):
    """Mask of slab positions whose canonical (== logical) index is even.

    ``base``: canonical-parity offset of local index 0 along ``axis``
    (even everywhere by construction, asserted at build time)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return ((ids + base) & 1) == 0


def _blocksum_t(v: jnp.ndarray, t_axes, parity_bases):
    """Aligned 2x2 transverse block sum at every position (in-register
    transverse_blocksum): per t-axis, add the parity partner."""
    out = v
    for ax in t_axes:
        even = _parity_even(out.shape, ax, parity_bases[ax])
        out = out + jnp.where(
            even, _sh_yz_or_x(out, ax, 1), _sh_yz_or_x(out, ax, -1)
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


def _level_input_names(level: int, levels: int) -> List[Tuple[str, object]]:
    names: List[Tuple[str, object]] = []
    names += [(f"u{f}", F32) for f in range(3)]
    if level + 1 < levels:
        names += [(f"up{f}", F32) for f in range(3)]
        names += [(f"pk{f}", KIND_DT) for f in range(3)]
    if level > 0:
        names += [(f"cs{f}", F32) for f in range(3)]
    names += [(f"vk{f}", KIND_DT) for f in range(3)]
    names += [(f"ek{a}", KIND_DT) for a in range(3)]
    names += [("ck", KIND_DT)]
    names += [(f"we{a}", F32) for a in range(3)]
    names += [("wc", F32)]
    names += [(f"m{f}", F32) for f in range(3)]
    return names


def _level_output_names(level: int, levels: int) -> List[str]:
    names = [f"out{f}" for f in range(3)]
    if level + 1 < levels:
        names += [f"zp{f}" for f in range(3)]
    if level > 0:
        names += [f"zc{f}" for f in range(3)]
    return names


def _make_level_kernel(level: int, levels: int, canon: Canon, dx: float,
                       enhanced: bool):
    """Build the fused A-apply kernel for one level.

    Slab layout: rows [0, TX+8) cover canonical x ∈ [TX + i·TX − 4, …+TX+8).
    Output rows are local [4, TX+4); taus and products live on the extended
    range [2, TX+6) so the ±1 adjoint shifts and the 2-wide blocksum reads
    stay in-slab.  Local row parity == canonical parity (everything even).
    """
    TX = canon.TX
    CX, CY, CZ = canon.shape
    R = TX + 4          # tau/product row count, base row 2
    BT, BO = 2, 4       # tau base row, out base row
    dxw = dx * (1 << level)
    in_names = _level_input_names(level, levels)
    out_names = _level_output_names(level, levels)
    NIN, NOUT = len(in_names), len(out_names)
    has_parent = level + 1 < levels
    has_child = level > 0

    def kernel(*refs):
        ins = refs[:NIN]
        outs = refs[NIN:NIN + NOUT]
        scratch = refs[NIN + NOUT:NIN + NOUT + NIN]
        sems = refs[NIN + NOUT + NIN]

        i = pl.program_id(0)
        start = i * TX + TX - 4
        copies = [
            pltpu.make_async_copy(
                ins[j].at[pl.ds(start, TX + 8)], scratch[j], sems.at[j]
            )
            for j in range(NIN)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        v = {}
        for j, (name, dt) in enumerate(in_names):
            v[name] = scratch[j][:]

        def kind(name, off=(0, 0, 0)):
            return _rd(v[name], BT, R, off, jnp.asarray(OUTSIDE, KIND_DT))

        def val(name, off=(0, 0, 0)):
            return _rd(v[name], BT, R, off, 0.0)

        # parity base of local index 0 on the tau range, per axis (all even:
        # x rows at local BT=2 ↔ canonical TX+i·TX−4+2, y/z at canonical 0)
        pbase = {0: 0, 1: 0, 2: 0}

        def emit(prod, off):
            """(TX, CY, CZ) out-rows view of prod shifted by −off."""
            xs = (BO - BT) - off[0]
            w = prod[xs:xs + TX]
            w = _sh_yz(w, 1, -off[1], 0.0)
            w = _sh_yz(w, 2, -off[2], 0.0)
            return w

        def emit_blocksum(prod, off, t_axes):
            """out[v] += sum_{w in block(v)} prod[w − off] on out rows."""
            z = _sh_yz_or_x(prod, 0, -off[0])
            z = _sh_yz(z, 1, -off[1], 0.0)
            z = _sh_yz(z, 2, -off[2], 0.0)
            b = _blocksum_t(z, t_axes, pbase)
            return b[BO - BT:BO - BT + TX]

        acc = {n: None for n in out_names}

        def add(name, contrib):
            acc[name] = contrib if acc[name] is None else acc[name] + contrib

        zero_i8 = jnp.asarray(0, KIND_DT)
        UNA = jnp.asarray(UNASSIGNED, KIND_DT)
        FLU = jnp.asarray(FLUID, KIND_DT)
        SB = jnp.asarray(SOLIDBOUNDARY, KIND_DT)
        OUT = jnp.asarray(OUTSIDE, KIND_DT)

        # ---------------- edge (shear) stresses, per edge axis ----------
        for a in range(3):
            active_edge = kind(f"ek{a}") == FLU
            f_axes = [f for f in range(3) if f != a]

            slotk = {}
            gdx_inv = {}
            is_trans = {}
            is_out = {}
            for f in f_axes:
                g = 3 - a - f
                for d in (0, 1):
                    off = _unit(g, -1) if d == 0 else (0, 0, 0)
                    slotk[(f, d)] = kind(f"vk{f}", off)
                k0, k1 = slotk[(f, 0)], slotk[(f, 1)]
                u_cnt = (k0 == UNA).astype(F32) + (k1 == UNA).astype(F32)
                gdx_inv[g] = 1.0 / (dxw * (1.0 + 0.5 * u_cnt))
                if enhanced:
                    is_trans[g] = (k0 == UNA) | (k1 == UNA)
                else:
                    is_trans[g] = None
                is_out[g] = (
                    (k0 == OUT) | (k0 == SB) | (k1 == OUT) | (k1 == SB)
                )

            terms = []  # (coeff, value, off, dest)
            for f in f_axes:
                g = 3 - a - f
                binv = gdx_inv[g]
                if enhanced:
                    enh = is_trans[g] & ~is_out[g]
                else:
                    enh = None
                for d in (0, 1):
                    off = _unit(g, -1) if d == 0 else (0, 0, 0)
                    sign = -1.0 if d == 0 else 1.0
                    k = slotk[(f, d)]
                    act = (k == FLU) & active_edge
                    base = sign * binv

                    # T1
                    if enhanced:
                        c1 = jnp.where(
                            act, jnp.where(enh, 0.25, 0.5) * base, 0.0
                        )
                    else:
                        c1 = jnp.where(act, 0.5 * base, 0.0)
                    terms.append((c1, val(f"u{f}", off), off, ("same", f)))

                    # T2: enhanced sibling, parity offset along the edge axis
                    if enhanced:
                        for even, so in ((True, 1), (False, -1)):
                            par = _parity_even(k.shape, a, pbase[a])
                            if not even:
                                par = ~par
                            c2 = jnp.where(act & enh & par, 0.25 * base, 0.0)
                            o2 = _add(off, _unit(a, so))
                            terms.append(
                                (c2, val(f"u{f}", o2), o2, ("same", f))
                            )

                    una = (k == UNA) & active_edge
                    if has_parent:
                        dang = ~_parity_even(k.shape, f, pbase[f])
                        # T3: non-dangling → parent face
                        c3 = jnp.where(una & ~dang, 0.5 * base, 0.0)
                        terms.append(
                            (c3, val(f"up{f}", off), off, ("parent", f))
                        )
                        # T4/T5: dangling → two parent faces or 4 inset kids
                        for so in (-1, 1):
                            offo = _add(off, _unit(f, so))
                            kp = kind(f"pk{f}", offo)
                            c4 = jnp.where(
                                una & dang & (kp == FLU), 0.25 * base, 0.0
                            )
                            terms.append(
                                (c4, val(f"up{f}", offo), offo, ("parent", f))
                            )
                            c5 = jnp.where(
                                una & dang & (kp == UNA), 0.0625 * base, 0.0
                            )
                            t_axes = [t for t in range(3) if t != f]
                            # forward reads B(u)[i + offo]: the 2x2 block is
                            # aligned at i + offo, so the parity base shifts
                            # by offo along each transverse axis
                            pb_shift = {
                                ax: pbase[ax] + offo[ax] for ax in range(3)
                            }
                            bs = _blocksum_t(
                                val(f"u{f}", offo), t_axes, pb_shift
                            )
                            terms.append((c5, bs, offo, ("blocksum", f)))

            tau = None
            for c, uv, off, dest in terms:
                contrib = c * uv
                tau = contrib if tau is None else tau + contrib
            wtau = val(f"we{a}") * tau

            for c, uv, off, dest in terms:
                mode, f = dest
                prod = c * wtau
                if mode == "same":
                    add(f"out{f}", emit(prod, off))
                elif mode == "parent":
                    add(f"zp{f}", emit(prod, off))
                else:  # blocksum
                    t_axes = [t for t in range(3) if t != f]
                    add(f"out{f}", emit_blocksum(prod, off, t_axes))

        # ---------------- center (normal) stresses ----------------------
        act_c = kind("ck") == FLU
        wcv = val("wc")
        for axis in range(3):
            cterms = []
            for d in (0, 1):
                off = (0, 0, 0) if d == 0 else _unit(axis, 1)
                sign = -1.0 if d == 0 else 1.0
                k = kind(f"vk{axis}", off)
                c1 = jnp.where((k == FLU) & act_c, sign / dxw, 0.0)
                cterms.append((c1, val(f"u{axis}", off), off, "same"))
                if has_child:
                    c2 = jnp.where(
                        (k == UNA) & act_c, 0.25 * sign / dxw, 0.0
                    )
                    cterms.append((c2, val(f"cs{axis}", off), off, "child"))
            tau = None
            for c, uv, off, dest in cterms:
                contrib = c * uv
                tau = contrib if tau is None else tau + contrib
            wtau = wcv * tau
            for c, uv, off, dest in cterms:
                prod = c * wtau
                if dest == "same":
                    add(f"out{axis}", emit(prod, off))
                else:
                    add(f"zc{axis}", emit(prod, off))

        # ---------------- mass term + stores -----------------------------
        for f in range(3):
            mv = _rd(v[f"m{f}"], BO, TX, (0, 0, 0), 0.0)
            uv = _rd(v[f"u{f}"], BO, TX, (0, 0, 0), 0.0)
            add(f"out{f}", mv * uv)

        for j, name in enumerate(out_names):
            val_out = acc[name]
            if val_out is None:
                val_out = jnp.zeros((TX, CY, CZ), F32)
            outs[j][:] = val_out

    return kernel, in_names, out_names


@functools.lru_cache(maxsize=None)
def _compiled_level_call(level: int, levels: int, canon: Canon, dx: float,
                         enhanced: bool, interpret: bool):
    kernel, in_names, out_names = _make_level_kernel(
        level, levels, canon, dx, enhanced
    )
    TX = canon.TX
    CX, CY, CZ = canon.shape
    NIN = len(in_names)

    call = pl.pallas_call(
        kernel,
        grid=(canon.K,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * NIN,
        out_specs=[
            pl.BlockSpec((TX, CY, CZ), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in out_names
        ],
        out_shape=[
            jax.ShapeDtypeStruct((CX, CY, CZ), F32) for _ in out_names
        ],
        scratch_shapes=[
            pltpu.VMEM((TX + 8, CY, CZ), dt) for _, dt in in_names
        ] + [pltpu.SemaphoreType.DMA((NIN,))],
        interpret=interpret,
    )
    return call, in_names, out_names


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
):
    """Embed the per-frame loop-invariant arrays into canonical boxes."""
    levels = len(res_per_level)
    canons = [make_canon(res_per_level[l]) for l in range(levels)]
    data: Dict[str, jnp.ndarray] = {}
    for l in range(levels):
        c = canons[l]
        for f in range(3):
            data[f"vk{f}_{l}"] = embed(
                vel_kinds[l][f].astype(KIND_DT), c, OUTSIDE
            )
            data[f"m{f}_{l}"] = embed(mass[(l, f)].astype(F32), c, 0.0)
        for a in range(3):
            data[f"ek{a}_{l}"] = embed(
                edge_kinds[l][a].astype(KIND_DT), c, OUTSIDE
            )
        data[f"ck_{l}"] = embed(center_kinds[l].astype(KIND_DT), c, OUTSIDE)
        if l + 1 < levels:
            for f in range(3):
                fsh = face_shape(res_per_level[l], f)
                pk = upread(vel_kinds[l + 1][f], fsh)
                data[f"pk{f}_{l}"] = embed(pk.astype(KIND_DT), c, OUTSIDE)
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
):
    """Return (apply_A, embed_tree, crop_tree) in canonical space."""
    levels = len(res_per_level)
    active_c = {
        (l, f): embed(active[(l, f)], canons[l], False)
        for l in range(levels)
        for f in range(3)
    }

    def fshape(l, f):
        return face_shape(res_per_level[l], f)

    def embed_tree(u: UField) -> UField:
        return {
            (l, f): embed(u[(l, f)].astype(F32), canons[l], 0.0)
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
            call, in_names, out_names = _compiled_level_call(
                l, levels, canons[l], dx, enhanced, interpret
            )
            args = []
            for name, _ in in_names:
                if name.startswith("u") and not name.startswith("up"):
                    args.append(u[(l, int(name[1]))])
                elif name.startswith("up") or name.startswith("cs"):
                    args.append(extras[f"{name}_{l}"])
                else:
                    args.append(frame[f"{name}_{l}"])
            res = call(*args)
            for name, r in zip(out_names, res):
                if name.startswith("out"):
                    outs[(l, int(name[3]))] = r
                elif name.startswith("zp"):
                    zps[(l, int(name[2]))] = r
                else:
                    zcs[(l, int(name[2]))] = r

        # cross-level adjoints (XLA)
        for (l, f), zp in zps.items():
            zl = crop(zp, canons[l], fshape(l, f))
            up_adj = upread_adjoint(zl, fshape(l + 1, f))
            outs[(l + 1, f)] = outs[(l + 1, f)] + embed(
                up_adj, canons[l + 1], 0.0
            )
        for (l, f), zc in zcs.items():
            zl = crop(zc, canons[l], fshape(l, f))
            cs_adj = face_child_sum_adjoint(zl, f, fshape(l - 1, f))
            outs[(l - 1, f)] = outs[(l - 1, f)] + embed(
                cs_adj, canons[l - 1], 0.0
            )

        return {
            k: jnp.where(active_c[k], outs[k], 0.0) for k in outs
        }

    return apply_A, embed_tree, crop_tree
