"""Multi-chip Pallas CG: shard_map + ppermute halos + psum dots.

The production TPU matvec is a manual-DMA Pallas kernel per octree level
(:mod:`..ops.pallas_apply`), which GSPMD cannot partition.  This module
distributes it explicitly — the TPU-native analog of the reference's only
scale-out axis (the OpenMP-threaded Eigen CG,
/root/reference/Source/HDK_AdaptiveViscosity.cpp:611-643) lifted to a 1D
device mesh:

* **Domain decomposition**: the x axis is split into ``n`` equal slabs of
  cells per level.  Every x-staggered array (x-faces, y/z-edges: extent
  ``nx+1``) is carried in *ghost-blocked* form — each device holds its
  ``w`` owned rows plus one ghost row duplicating the neighbour's first
  face — so each device's local arrays form a self-consistent local MAC
  problem and the **unmodified per-level Pallas kernels** run on local
  canonical boxes.
* **Halo exchange**: kernels read up to ``MAX_HALO`` (4) canonical rows
  beyond the local domain.  The canonical pads of every kernel input are
  filled from the neighbours with ``jax.lax.ppermute`` (ICI
  collective-permute): once per frame for kinds/weights, once per CG
  iteration for the velocity iterate and the cross-level views.
  Boundary stress rows are recomputed redundantly by both neighbours
  (overlapping-halo decomposition) so no output exchange is needed.
* **Reductions**: CG dot products are local ``vdot``s + ``lax.psum`` over
  the mesh axis (ICI all-reduce).

Level-l divisibility constraints (checked by :func:`shardable_levels`):
``n | nx_l`` for every level, and the local width ``w_l`` must be even for
every level below the top (parity-dependent stencil cases — enhanced
siblings, dangling edges — require local parity == global parity; the top
level has no coarse transitions, cpp:1301-1319, so odd top widths are
fine).  When the constraints fail the caller falls back to the GSPMD
whole-array operator.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .. import classify, operator, stencils
from ..config import SolverConfig
from ..ops import pallas_apply
from ..ops.arrayops import face_child_sum, face_shape, upread, upread_adjoint, \
    face_child_sum_adjoint

UField = Dict[Tuple[int, int], jnp.ndarray]
MAX_HALO = pallas_apply.MAX_HALO


# ---------------------------------------------------------------------------
# shardability + ghost-blocked layout
# ---------------------------------------------------------------------------


def shardable_levels(res_per_level: Sequence[Tuple[int, int, int]],
                     n: int) -> bool:
    """True iff the level pyramid admits the 1D-x decomposition."""
    levels = len(res_per_level)
    for l, res in enumerate(res_per_level):
        if res[0] % n != 0:
            return False
        w = res[0] // n
        if l < levels - 1 and w % 2 != 0:
            return False
        if w < 1:
            return False
    return True


def _is_staggered_x(shape: Tuple[int, ...], nx: int) -> bool:
    return shape[0] == nx + 1


def block_x(arr: jnp.ndarray, nx: int, n: int) -> jnp.ndarray:
    """Ghost-blocked form of an x-staggered array: device block ``d`` holds
    global rows ``[d*w, d*w + w]`` inclusive — its ``w`` owned faces plus
    one ghost row (the right neighbour's first face; on the last device the
    global closing face, which it owns).  Cell-extent arrays pass through
    unchanged (they split evenly)."""
    if not _is_staggered_x(arr.shape, nx):
        assert arr.shape[0] == nx, (arr.shape, nx)
        return arr
    w = nx // n
    idx = np.concatenate([np.arange(d * w, d * w + w + 1) for d in range(n)])
    return arr[jnp.asarray(idx)]

def unblock_x(arr: jnp.ndarray, nx: int, n: int) -> jnp.ndarray:
    """Inverse of :func:`block_x` (owned rows + the final closing face)."""
    w = nx // n
    if arr.shape[0] == nx:
        return arr
    assert arr.shape[0] == n * (w + 1), (arr.shape, nx, n)
    parts = [arr[d * (w + 1): d * (w + 1) + w] for d in range(n)]
    parts.append(arr[-1:])
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# in-shard halo primitives
# ---------------------------------------------------------------------------


def _from_left(x: jnp.ndarray, axis_name: str, n: int, fill) -> jnp.ndarray:
    """Value of ``x`` on the left neighbour (device d-1); ``fill`` on d=0."""
    if n == 1:
        return jnp.full_like(x, fill)
    got = lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])
    d = lax.axis_index(axis_name)
    return jnp.where(d == 0, jnp.full_like(x, fill), got)


def _from_right(x: jnp.ndarray, axis_name: str, n: int, fill) -> jnp.ndarray:
    if n == 1:
        return jnp.full_like(x, fill)
    got = lax.ppermute(x, axis_name, [(i + 1, i) for i in range(n - 1)])
    d = lax.axis_index(axis_name)
    return jnp.where(d == n - 1, jnp.full_like(x, fill), got)


def fill_halo_canon(uc: jnp.ndarray, canon, X: int, stag: int,
                    axis_name: str, n: int, fill=0.0) -> jnp.ndarray:
    """Fill the canonical x pads (and, for staggered arrays, refresh the
    ghost row) from the neighbours' REAL rows.

    ``X``: local logical x extent (w + stag).  Owned real rows of a
    staggered array are [0, X-1) plus the ghost at X-1; of a cell array
    [0, X).  My pad rows [-H, 0) mirror the left neighbour's rows
    [X-stag-H, X-stag); my rows [X-stag, X-stag+H+stag) come from the right
    neighbour's rows [stag, stag+H+stag) — which for staggered arrays
    overwrites the ghost row with the neighbour's first owned face (the CG
    iterate keeps ghosts at zero between applies).
    """
    H = MAX_HALO
    ox, oy, oz = canon.off
    # left halo <- left neighbour's last H real rows [X-stag-H, X-stag)
    left_src = uc[ox + X - stag - H: ox + X - stag]
    left = _from_left(left_src, axis_name, n, fill)
    # ghost refresh + right halo <- right neighbour's first H+stag owned
    # rows [0, H+stag): my row (X-stag)+j is global face (d+1)*w + j
    right_src = uc[ox: ox + H + stag]
    right = _from_right(right_src, axis_name, n, fill)
    if stag:
        # the last device OWNS its closing face (global row nx): keep it
        d = lax.axis_index(axis_name)
        keep = jnp.where(d == n - 1, uc[ox + X - 1: ox + X], right[:1])
        right = jnp.concatenate([keep, right[1:]], axis=0)
    uc = lax.dynamic_update_slice(uc, left, (ox - H, 0, 0))
    uc = lax.dynamic_update_slice(uc, right, (ox + X - stag, 0, 0))
    return uc


def _embed_halo(arr: jnp.ndarray, canon, stag: int, axis_name: str, n: int,
                fill) -> jnp.ndarray:
    """:func:`pallas_apply.embed` + halo fill, for per-frame kernel inputs
    (ghost rows already hold real values from the blocked layout)."""
    e = pallas_apply.embed(arr, canon, fill)
    H = MAX_HALO
    ox = canon.off[0]
    X = arr.shape[0]
    left = _from_left(e[ox + X - stag - H: ox + X - stag], axis_name, n, fill)
    right = _from_right(e[ox + stag + stag: ox + stag + stag + H],
                        axis_name, n, fill)
    e = lax.dynamic_update_slice(e, left, (ox - H, 0, 0))
    e = lax.dynamic_update_slice(e, right, (ox + X, 0, 0))
    return e


# ---------------------------------------------------------------------------
# the sharded CG stage
# ---------------------------------------------------------------------------


def _local_frame_data(vel_kinds, edge_kinds, center_kinds, we, wc, mass,
                      res_local, canons, axis_name, n):
    """Per-device analog of :func:`pallas_apply.build_frame_data`: identical
    packing/embedding, with every stress-row / stencil-read input's
    canonical pads halo-filled from the neighbours."""
    levels = len(res_local)
    data: Dict[str, jnp.ndarray] = {}
    for l in range(levels):
        c = canons[l]
        nxl = res_local[l][0]

        def stag_of(shape):
            return 1 if shape[0] == nxl + 1 else 0

        kinds: Dict[str, jnp.ndarray] = {}
        for f in range(3):
            kinds[f"vk{f}"] = vel_kinds[l][f]
            # mass is read on out rows only: plain embed, no halo
            data[f"m{f}_{l}"] = pallas_apply.embed(
                mass[(l, f)].astype(jnp.float32), c, 0.0)
        for a in range(3):
            kinds[f"ek{a}"] = edge_kinds[l][a]
        kinds["ck"] = center_kinds[l]
        if l + 1 < levels:
            for f in range(3):
                fsh = face_shape(res_local[l], f)
                kinds[f"pk{f}"] = upread(vel_kinds[l + 1][f], fsh)
        for g, group in enumerate(pallas_apply._pack_groups(l, levels)):
            packed = None
            for slot, name in enumerate(group):
                arr = (-kinds[name]).astype(jnp.int32)
                code = _embed_halo(arr, c, stag_of(arr.shape), axis_name, n, 3)
                term = code << (2 * slot)
                packed = term if packed is None else packed | term
            for slot in range(len(group), 3):
                packed = packed | (3 << (2 * slot))
            data[f"kp{g}_{l}"] = packed.astype(pallas_apply.KIND_DT)
        for a in range(3):
            arr = we[(l, a)].astype(jnp.float32)
            data[f"we{a}_{l}"] = _embed_halo(arr, c, stag_of(arr.shape),
                                             axis_name, n, 0.0)
        arr = wc[l].astype(jnp.float32)
        data[f"wc_{l}"] = _embed_halo(arr, c, 0, axis_name, n, 0.0)
    return data


def _sharded_apply(frame, canons, res_local, active_c, own, dx, enhanced,
                   interpret, axis_name, n):
    """apply_A on local canonical trees: per-iteration halo fill of the
    iterate + cross-level views, then the unmodified per-level kernels,
    then the cross-level adjoints, then the ownership mask."""
    levels = len(res_local)

    def fshape(l, f):
        return face_shape(res_local[l], f)

    def stag(l, f):
        return 1 if f == 0 else 0  # x-faces are x-staggered

    def apply_A(u: UField) -> UField:
        # refresh halos (and ghost rows) of the iterate
        u = {
            (l, f): fill_halo_canon(
                u[(l, f)], canons[l], fshape(l, f)[0], stag(l, f),
                axis_name, n,
            )
            for (l, f) in u
        }
        # cross-level views from halo-complete locals, then their own halos
        extras: Dict[str, jnp.ndarray] = {}
        for l in range(levels):
            if l + 1 < levels:
                for f in range(3):
                    cu = pallas_apply.crop(
                        u[(l + 1, f)], canons[l + 1], fshape(l + 1, f))
                    e = pallas_apply.embed(
                        upread(cu, fshape(l, f)), canons[l], 0.0)
                    extras[f"up{f}_{l}"] = fill_halo_canon(
                        e, canons[l], fshape(l, f)[0], stag(l, f),
                        axis_name, n)
            if l > 0:
                for f in range(3):
                    fu = pallas_apply.crop(
                        u[(l - 1, f)], canons[l - 1], fshape(l - 1, f))
                    e = pallas_apply.embed(
                        face_child_sum(fu, f, fshape(l, f)), canons[l], 0.0)
                    extras[f"cs{f}_{l}"] = fill_halo_canon(
                        e, canons[l], fshape(l, f)[0], stag(l, f),
                        axis_name, n)

        outs: Dict[Tuple[int, int], jnp.ndarray] = {}
        zps: Dict[Tuple[int, int], jnp.ndarray] = {}
        zcs: Dict[Tuple[int, int], jnp.ndarray] = {}
        for l in range(levels):
            f_call, fin, fout = pallas_apply._compiled_fused_call(
                l, levels, canons[l], dx, enhanced, interpret
            )

            def arg_for(name):
                if name.startswith("u") and not name.startswith("up"):
                    return u[(l, int(name[1]))]
                if name.startswith("up") or name.startswith("cs"):
                    return extras[f"{name}_{l}"]
                return frame[f"{name}_{l}"]

            res = f_call(*[arg_for(nm) for nm, _, _ in fin])
            for name, r in zip(fout, res):
                if name.startswith("out"):
                    outs[(l, int(name[3]))] = r
                elif name.startswith("zp"):
                    zps[(l, int(name[2]))] = r
                else:
                    zcs[(l, int(name[2]))] = r

        for (l, f), zp in zps.items():
            zl = pallas_apply.crop(zp, canons[l], fshape(l, f))
            up_adj = upread_adjoint(zl, fshape(l + 1, f))
            outs[(l + 1, f)] = outs[(l + 1, f)] + jnp.where(
                active_c[(l + 1, f)],
                pallas_apply.embed(up_adj, canons[l + 1], 0.0), 0.0)
        for (l, f), zc in zcs.items():
            zl = pallas_apply.crop(zc, canons[l], fshape(l, f))
            cs_adj = face_child_sum_adjoint(zl, f, fshape(l - 1, f))
            outs[(l - 1, f)] = outs[(l - 1, f)] + jnp.where(
                active_c[(l - 1, f)],
                pallas_apply.embed(cs_adj, canons[l - 1], 0.0), 0.0)

        # ownership: zero ghost rows (the right neighbour owns that DOF) so
        # distributed dots count every DOF exactly once
        return {k: outs[k] * own[k] for k in outs}

    return apply_A


def sharded_pallas_pcg(
    mesh: Mesh,
    axis_name: str,
    vel_kinds, edge_kinds, center_kinds,
    we, wc,
    mass: UField, active: UField,
    rhs: UField, guess: UField, diag: UField,
    res_per_level, dx: float, enhanced: bool,
    tolerance: float, max_iterations: int,
    interpret: bool = False,
    cheb_degree: int = 1,
):
    """Distributed Jacobi-PCG with the fused Pallas matvec, over a 1D mesh.

    All array inputs are GLOBAL logical per-level grids (float32 for the
    face trees); returns (solution tree, iterations, relative residual)
    with the same global layout.  One ``shard_map`` spans halo-filled frame
    prep + the whole CG while-loop.
    """
    n = mesh.devices.size
    levels = len(res_per_level)
    res_local = [(r[0] // n, r[1], r[2]) for r in res_per_level]
    canons = [pallas_apply.make_canon(r) for r in res_local]

    def fshape_l(l, f):
        return face_shape(res_local[l], f)

    # ---- ghost-blocked global layout + sharding specs
    spec = P(axis_name, None, None)
    ns = NamedSharding(mesh, spec)

    def prep(tree_or_list, nx_of):
        """block_x every array; returns same structure."""
        if isinstance(tree_or_list, dict):
            return {k: block_x(v, nx_of(k), n) for k, v in tree_or_list.items()}
        raise TypeError

    def face_nx(k):
        return res_per_level[k[0]][0]

    b_vk = [[block_x(vel_kinds[l][f], res_per_level[l][0], n)
             for f in range(3)] for l in range(levels)]
    b_ek = [[block_x(edge_kinds[l][a], res_per_level[l][0], n)
             for a in range(3)] for l in range(levels)]
    b_ck = [center_kinds[l] for l in range(levels)]  # cell grids: even split
    b_we = {k: block_x(v, res_per_level[k[0]][0], n) for k, v in we.items()}
    b_wc = list(wc)
    b_mass = prep(mass, face_nx)
    b_active = prep({k: v.astype(jnp.bool_) for k, v in active.items()}, face_nx)
    b_rhs = prep(rhs, face_nx)
    b_guess = prep(guess, face_nx)
    b_diag = prep(diag, face_nx)

    specs_of = lambda tree: jax.tree_util.tree_map(lambda _: spec, tree)

    args = (b_vk, b_ek, b_ck, b_we, b_wc, b_mass, b_active, b_rhs, b_guess,
            b_diag)
    in_specs = jax.tree_util.tree_map(lambda _: spec, args)
    out_specs = (jax.tree_util.tree_map(lambda _: spec, b_rhs), P(), P())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )
    def run(vk, ek, ck, wel, wcl, massl, activel, rhsl, guessl, diagl):
        frame = _local_frame_data(
            vk, ek, ck, wel, wcl, massl, res_local, canons, axis_name, n)

        # ownership mask per face grid (canonical): pads 0; ghost row 0
        # except on the last device
        own = {}
        active_c = {}
        d = lax.axis_index(axis_name)
        for l in range(levels):
            for f in range(3):
                fs = fshape_l(l, f)
                o = jnp.ones(fs, jnp.float32)
                if f == 0:
                    last = jnp.where(d == n - 1, 1.0, 0.0)
                    o = o.at[-1].set(last)
                own[(l, f)] = pallas_apply.embed(o, canons[l], 0.0)
                active_c[(l, f)] = pallas_apply.embed(
                    activel[(l, f)], canons[l], False)

        apply_A = _sharded_apply(
            frame, canons, res_local, active_c, own, dx, enhanced,
            interpret, axis_name, n)

        def emb(tree, fill=0.0):
            return {
                (l, f): pallas_apply.embed(
                    tree[(l, f)].astype(jnp.float32), canons[l], fill)
                for (l, f) in tree
            }

        # ghost rows of the CG vectors must hold ZERO (the owner carries
        # the DOF); blocked inputs carry real values there — mask them
        rhs_c = {k: emb(rhsl)[k] * own[k] for k in rhsl}
        guess_c = {k: emb(guessl)[k] * own[k] for k in guessl}
        diag_c = emb(diagl, fill=1.0)
        diag_c = {k: jnp.where(own[k] > 0, diag_c[k], 1.0) for k in diag_c}

        shapes = {k: tuple(v.shape) for k, v in rhs_c.items()}
        pack, unpack = operator.make_packer(shapes)

        def A(flat):
            return pack(apply_A(unpack(flat)))

        def dot(x, y):
            return lax.psum(jnp.vdot(x, y), axis_name)

        b = pack(rhs_c)
        invd = 1.0 / pack(diag_c)
        b_norm2 = dot(b, b)
        threshold = tolerance * tolerance * b_norm2
        precond = None
        if cheb_degree > 1:
            lam = operator.estimate_lambda_max(A, invd, b, dot=dot)
            precond = operator.make_chebyshev_precond(A, invd, lam,
                                                      cheb_degree)
        x, iters, rr = operator._flat_pcg(
            A, b, pack(guess_c), invd, threshold, max_iterations, dot=dot,
            precond=precond)
        rel = jnp.sqrt(rr / jnp.maximum(b_norm2, 1e-300))
        sol = unpack(x)
        sol_l = {
            k: pallas_apply.crop(sol[k], canons[k[0]], fshape_l(*k))
            for k in sol
        }
        return sol_l, iters, rel

    sol_blocked, iters, rel = run(*args)
    solution = {
        k: unblock_x(sol_blocked[k], res_per_level[k[0]][0], n)
        for k in sol_blocked
    }
    # the solve carried ghost rows as zeros on non-owners; owned rows are
    # exact.  unblock_x reads owned rows only, so nothing further needed.
    return solution, iters, rel
