"""Halo-padded matrix-free operator — the bandwidth-lean apply path.

Numerically identical to :mod:`operator` (validated against it), but
structured so that every per-iteration access on large arrays is a *pure
static slice* of a halo-padded array, and cross-level lifts are shared,
materialized-once views.  The v1 operator's per-term pads / scatters /
strided reshapes each materialize a full array; on the benchmark device
(~40 GB/s effective HBM) those copies dominate the CG iteration.

Layout (halos EVEN so parent/child index algebra survives padding:
``(q + 2h) >> 1 == (q >> 1) + h``):

* velocity / CG vectors ``u``:            halo **4**, zeros outside
* stress grids ``tau``, coeffs, weights:  halo **2**, zeros outside
* shared lifted views (per level/axis):   halo 4-compatible, see below

Coefficients are *born* padded: the stencil builders run unchanged on
halo-2-padded classification grids (padding kinds with the OUTSIDE
sentinel); every coefficient already carries the ``active``-mask, so the
halo region is exactly zero, which in turn zeroes ``tau``'s halo — the
invariant all the slice-adjoints rely on.

Forward (per stress grid, shape = halo-2 padded):

    tau[e'] = sum_t c_t[e'] * V_t[e' + off_t (+ view shift)]

Adjoint, output-centric (out = logical face grids):

    same:     out[v] += (c_t * w * tau)[v - off + 2]            (slice)
    parent:   out_c[c] += sum_{p in {0,1}^3} z[2c - off + p + 2] (strided)
    childsum: out[v] += even_axis(v) * upread(z)[v + 4 - 2*off]  (repeat of
              a small coarse array + slice)
    blocksum: out[v] += B(z)[v - off]  via parity-masked slices
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from . import classify
from .ops.arrayops import face_shape
from .stencils import StressBlock, StressTerm

UField = Dict[Tuple[int, int], jnp.ndarray]

HU = 4  # velocity halo
HS = 2  # stress/coeff halo


def pad_halo(x: jnp.ndarray, h: int, fill=0) -> jnp.ndarray:
    return jnp.pad(x, [(h, h)] * x.ndim, constant_values=fill)


def unpad_halo(x: jnp.ndarray, h: int) -> jnp.ndarray:
    return x[tuple(slice(h, s - h) for s in x.shape)]


def _sl(x: jnp.ndarray, shape, start, step=(1, 1, 1)) -> jnp.ndarray:
    idx = tuple(
        slice(st, st + (n - 1) * sp + 1, sp) for st, n, sp in zip(start, shape, step)
    )
    return x[idx]


def _parity_even(shape, axis, halo):
    """Mask of positions whose LOGICAL index is even (halo must be even)."""
    assert halo % 2 == 0
    idx = jnp.arange(shape[axis]).reshape(
        [shape[axis] if d == axis else 1 for d in range(3)]
    )
    return jnp.broadcast_to(idx % 2 == 0, shape)


# ---------------------------------------------------------------------------
# shared lifted views of u (built once per apply, reused by every term)
# ---------------------------------------------------------------------------


def _build_views(blocks: Sequence[StressBlock], u: UField, rpl):
    """u view per (lift, stress_level, face_axis).

    Returned arrays and the index shift to apply when slicing with a term
    offset ``off`` at padded stress index ``e'``:
        view_index = e' + off + shift
    """
    views = {}
    needed = set()
    for b in blocks:
        for t in b.terms:
            needed.add((t.lift, b.level, t.face_axis, t.src_level))
    for lift, lvl, f, src in needed:
        key = (lift, lvl, f)
        if key in views:
            continue
        if lift == "same":
            views[key] = (u[(src, f)], HU - HS)  # index e' + off + 2
        elif lift == "parent":
            # U[w] = u_src[(w >> 1) - HU]; want u_src[(e + off) >> 1]
            # => w = e + off + 2*HU; padded e' = e + HS => shift = 2*HU - HS
            cu = u[(src, f)]
            out_shape = tuple(2 * s for s in cu.shape)
            up = cu
            for d in range(3):
                up = jnp.repeat(up, 2, axis=d)
            views[key] = (up, 2 * HU - HS)
        elif lift == "childsum":
            # CS[P] = sum over 4 children of coarse face P (children at fine
            # in-axis 2P, transverse 2P + {0,1}).  Build at coarse halo HS:
            # CS_pad[P'] with P' = P + HS reads fine u_pad4 index
            # 2P + b + HU = 2P' + b  (HU == 2*HS).
            # Term offsets for childsum are the center-stencil ones
            # ((0,0,0) or +e_axis), so reads at shift 0 never go negative.
            fu = u[(src, f)]
            t_axes = [d for d in range(3) if d != f]
            cshape = face_shape(rpl[src + 1], f)
            coarse_shape = tuple(cs + 2 * HS for cs in cshape)
            total = None
            for b1 in (0, 1):
                for b2 in (0, 1):
                    bb = {t_axes[0]: b1, t_axes[1]: b2, f: 0}
                    start = tuple(bb[d] for d in range(3))
                    view = _sl(fu, coarse_shape, start, (2, 2, 2))
                    total = view if total is None else total + view
            views[key] = (total, 0)
        elif lift == "blocksum":
            # B(u)[q] = sum over the aligned 2x2 transverse block of q.
            # Build at fine halo HU via parity-selected slices.
            fu = u[(src, f)]
            t_axes = [d for d in range(3) if d != f]
            shape = fu.shape

            def axis_bs(arr, axis, base_off):
                even = _parity_even(shape, axis, HU)
                a0 = _sl(arr, shape, tuple(base_off))
                op_ = list(base_off); op_[axis] += 1
                om_ = list(base_off); om_[axis] -= 1
                ap = _sl(arr, shape, tuple(op_))
                am = _sl(arr, shape, tuple(om_))
                return a0 + jnp.where(even, ap, am)

            fup = pad_halo(fu, 1)
            t1, t2 = t_axes
            vals = {}
            for o2 in (-1, 0, 1):
                base = [1, 1, 1]
                base[t2] += o2
                vals[o2] = axis_bs(fup, t1, base)
            even2 = _parity_even(shape, t2, HU)
            bs = vals[0] + jnp.where(even2, vals[1], vals[-1])
            views[key] = (bs, HU - HS)
        else:
            raise ValueError(lift)
    return views


def apply_D2(blocks, u: UField, rpl, views=None) -> List[jnp.ndarray]:
    """tau per block, halo-HS padded (zero halo, by the coeff masks)."""
    if views is None:
        views = _build_views(blocks, u, rpl)
    taus = []
    for b in blocks:
        tau = None
        for t in b.terms:
            view, shift = views[(t.lift, b.level, t.face_axis)]
            start = tuple(o + shift for o in t.offset)
            contrib = t.coeff * _sl(view, t.coeff.shape, start)
            tau = contrib if tau is None else tau + contrib
        taus.append(tau)
    return taus


def apply_DT2(blocks, wtaus, out_shapes, rpl) -> UField:
    """Output-centric adjoint; returns LOGICAL (unpadded) face grids."""
    out = {k: None for k in out_shapes}

    def acc(key, val):
        out[key] = val if out[key] is None else out[key] + val

    for b, wt in zip(blocks, wtaus):
        for t in b.terms:
            key = (t.src_level, t.face_axis)
            tgt = out_shapes[key]
            f = t.face_axis
            if t.lift == "same":
                # out[v] += c[v - off] * wt[v - off]; padded index = +HS
                start = tuple(HS - o for o in t.offset)
                acc(key, _sl(t.coeff, tgt, start) * _sl(wt, tgt, start))
            elif t.lift == "parent":
                # out_c[c] += sum_p (c*wt)[2c - off + p]; padded idx +HS
                total = None
                for p0 in (0, 1):
                    for p1 in (0, 1):
                        for p2 in (0, 1):
                            pp = (p0, p1, p2)
                            start = tuple(HS - t.offset[d] + pp[d] for d in range(3))
                            v = _sl(t.coeff, tgt, start, (2, 2, 2)) * \
                                _sl(wt, tgt, start, (2, 2, 2))
                            total = v if total is None else total + v
                acc(key, total)
            elif t.lift == "childsum":
                # out[v] += even_f(v) * (c*wt)[(v >> 1) - off]
                z = t.coeff * wt  # coarse, halo HS
                up = z
                for d in range(3):
                    up = jnp.repeat(up, 2, axis=d)
                # up[w] = z_pad[w >> 1] = z_logical[(w >> 1) - HS]
                # want (v >> 1) - off  => w = v + 2*HS - 2*off (v even along f
                # keeps parity; odd v along transverse hits the same cell)
                start = tuple(2 * HS - 2 * o for o in t.offset)
                view = _sl(up, tgt, start)
                even = _parity_even(tgt, f, 0)
                acc(key, jnp.where(even, view, 0.0))
            elif t.lift == "blocksum":
                # out[v] += sum_{w in block(v)} z[w - off]  — shift FIRST,
                # then the block sum aligned on v's own parity (the offset
                # can break block alignment, so B does not commute with it).
                z = t.coeff * wt
                t_axes = [d for d in range(3) if d != f]
                zp = pad_halo(z, 1)  # halo HS+1; logical q at index q+3

                def read(extra):
                    start = tuple(
                        HS + 1 - t.offset[d] + extra[d] for d in range(3)
                    )
                    return _sl(zp, tgt, start)

                t1, t2 = t_axes
                even1 = _parity_even(tgt, t1, 0)
                even2 = _parity_even(tgt, t2, 0)
                vals = {}
                for o2 in (-1, 0, 1):
                    e = [0, 0, 0]; e[t2] = o2
                    a0 = read(tuple(e))
                    ep = list(e); ep[t1] += 1
                    em = list(e); em[t1] -= 1
                    vals[o2] = a0 + jnp.where(even1, read(tuple(ep)),
                                              read(tuple(em)))
                acc(key, vals[0] + jnp.where(even2, vals[1], vals[-1]))
            else:
                raise ValueError(t.lift)
    return {
        k: (v if v is not None else jnp.zeros(out_shapes[k]))
        for k, v in out.items()
    }


def pad_kinds(vel_kinds, edge_kinds, center_kinds):
    """Halo-HS-pad the classification grids with their natural outside
    sentinels (velocity/edge: OUTSIDE; center: UNASSIGNED)."""
    vk = [[pad_halo(k, HS, classify.OUTSIDE) for k in per] for per in vel_kinds]
    ek = [[pad_halo(k, HS, classify.OUTSIDE) for k in per] for per in edge_kinds]
    ck = [pad_halo(k, HS, classify.UNASSIGNED) for k in center_kinds]
    return vk, ek, ck


def pad_block_data(blocks: Sequence[StressBlock]) -> List[StressBlock]:
    """Pad materialized coeffs/weights/boundary to halo HS (zero fill)."""
    out = []
    for b in blocks:
        terms = [
            StressTerm(t.lift, t.face_axis, t.src_level, t.offset,
                       pad_halo(t.coeff, HS))
            for t in b.terms
        ]
        out.append(StressBlock(
            b.kind, b.level, b.axis,
            pad_halo(b.weight, HS) if b.weight is not None else None,
            terms,
            pad_halo(b.boundary, HS) if b.boundary is not None else None,
        ))
    return out


def make_operator2(
    blocks_padded: Sequence[StressBlock],
    mass: UField,
    active: UField,
    res_per_level,
    terms_builder=None,
):
    """(apply_A, pad_tree, unpad_tree).  ``blocks_padded`` must carry
    halo-HS coeffs/weights (see pad_block_data / padded stencil builders);
    mass/active are logical.  apply_A maps halo-HU pytrees to halo-HU
    pytrees."""
    out_shapes = {k: tuple(m.shape) for k, m in mass.items()}
    mass_pad = {k: pad_halo(m, HU) for k, m in mass.items()}
    active_pad = {k: pad_halo(a, HU) for k, a in active.items()}

    def apply_A(u_pad: UField) -> UField:
        work = terms_builder() if terms_builder is not None else blocks_padded
        views = _build_views(work, u_pad, res_per_level)
        taus = apply_D2(work, u_pad, res_per_level, views)
        wtaus = [b.weight * t for b, t in zip(blocks_padded, taus)]
        out = apply_DT2(work, wtaus, out_shapes, res_per_level)
        out = {k: pad_halo(v, HU) for k, v in out.items()}
        return {
            k: jnp.where(active_pad[k], out[k] + mass_pad[k] * u_pad[k], 0.0)
            for k in u_pad
        }

    def pad_tree(u: UField) -> UField:
        return {k: pad_halo(v, HU) for k, v in u.items()}

    def unpad_tree(u: UField) -> UField:
        return {k: unpad_halo(v, HU) for k, v in u.items()}

    return apply_A, pad_tree, unpad_tree
