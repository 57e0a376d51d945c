"""Matrix-free application of the viscosity system on the dense pyramid.

The system solved is the reference's
``(Mu + 2 dt D^T K Mtau U D) u^{n+1} = Mu u^n``
(/root/reference/Source/HDK_AdaptiveViscosity.cpp:424) — here applied without
ever assembling a sparse matrix:

    A u  =  M u  +  D^T (W (D u))
    rhs  =  M guess  -  D^T (W b)            (b = solid-velocity terms)
    diag =  M  +  sum_s W_s * coeff_s^2      (Jacobi preconditioner)

``u`` is a pytree: one dense face array per (level, axis), zero outside FLUID
faces.  D / D^T / diag all derive from the same :class:`stencils.StressTerm`
lists, so there is a single correctness surface.  Every operation is a
shifted/strided whole-array op — fusible by XLA and shardable with
``jax.sharding`` over the spatial axes.

Replaces the reference's triplet assembly + Eigen CG
(cpp:2404-2777, 596-653).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ops.arrayops import (
    face_child_sum,
    face_child_sum_adjoint,
    face_shape,
    gather_offset,
    scatter_offset,
    transverse_blocksum,
    upread,
    upread_adjoint,
)
from .stencils import StressBlock, StressTerm

UField = Dict[Tuple[int, int], jnp.ndarray]  # (level, axis) -> face array


def _lift(term: StressTerm, u: UField, stress_level: int, res_per_level) -> jnp.ndarray:
    """Produce the level-``stress_level`` face-grid view of the source array."""
    src = u[(term.src_level, term.face_axis)]
    fshape = face_shape(res_per_level[stress_level], term.face_axis)
    if term.lift == "same":
        return src
    if term.lift == "parent":
        return upread(src, fshape)
    if term.lift == "childsum":
        return face_child_sum(src, term.face_axis, fshape)
    if term.lift == "blocksum":
        return transverse_blocksum(src, term.face_axis)
    raise ValueError(term.lift)


def _lift_adjoint(term: StressTerm, z: jnp.ndarray, res_per_level) -> jnp.ndarray:
    """Adjoint of :func:`_lift`: distribute ``z`` back onto the source grid."""
    src_shape = face_shape(res_per_level[term.src_level], term.face_axis)
    if term.lift == "same":
        return z
    if term.lift == "parent":
        return upread_adjoint(z, src_shape)
    if term.lift == "childsum":
        return face_child_sum_adjoint(z, term.face_axis, src_shape)
    if term.lift == "blocksum":
        return transverse_blocksum(z, term.face_axis)  # self-adjoint
    raise ValueError(term.lift)


def apply_D(blocks: Sequence[StressBlock], u: UField, res_per_level) -> List[jnp.ndarray]:
    """tau_s = sum_t coeff_t * lift_t(u)[. + offset_t] for every stress grid."""
    taus = []
    for b in blocks:
        tau = None
        for t in b.terms:
            y = _lift(t, u, b.level, res_per_level)
            contrib = t.coeff * gather_offset(y, t.coeff.shape, t.offset)
            tau = contrib if tau is None else tau + contrib
        taus.append(tau)
    return taus


def apply_DT(
    blocks: Sequence[StressBlock],
    taus: Sequence[jnp.ndarray],
    u_like: UField,
    res_per_level,
) -> UField:
    """u_v += sum_s coeff_{s,v} tau_s (adjoint of :func:`apply_D`)."""
    out = {k: jnp.zeros_like(v) for k, v in u_like.items()}
    for b, tau in zip(blocks, taus):
        for t in b.terms:
            fshape = face_shape(res_per_level[b.level], t.face_axis)
            z = scatter_offset(t.coeff * tau, fshape, t.offset)
            key = (t.src_level, t.face_axis)
            out[key] = out[key] + _lift_adjoint(t, z, res_per_level)
    return out


def make_operator(
    blocks: Sequence[StressBlock],
    mass: UField,
    active: UField,
    res_per_level,
    terms_builder=None,
):
    """Return (apply_A, diag): the SPD matvec and its Jacobi diagonal.

    ``active`` are boolean FLUID masks per (level, axis); A is supported on
    them (reads and writes outside are masked away).

    ``terms_builder``: optional zero-arg callable returning a parallel list
    of StressBlocks whose *terms* are used in place of ``blocks``'s.  When
    the matvec runs inside a CG while-loop, rebuilding the coefficient
    arrays from the (tiny, int8) classification grids per iteration trades
    ~100 MB of loop-carried f32 HBM reads for cheap fused element-wise
    recompute — XLA does not hoist expanding computations out of the loop,
    so the rebuild genuinely stays in the loop body.
    """

    def apply_A(u: UField) -> UField:
        work = terms_builder() if terms_builder is not None else blocks
        taus = apply_D(work, u, res_per_level)
        taus = [b.weight * t for b, t in zip(blocks, taus)]
        out = apply_DT(work, taus, u, res_per_level)
        return {
            k: jnp.where(active[k], out[k] + mass[k] * u[k], 0.0) for k in u
        }

    diag = {k: jnp.zeros_like(v) for k, v in mass.items()}
    for b in blocks:
        for t in b.terms:
            fshape = face_shape(res_per_level[b.level], t.face_axis)
            z = scatter_offset(b.weight * t.coeff * t.coeff, fshape, t.offset)
            key = (t.src_level, t.face_axis)
            diag[key] = diag[key] + _lift_adjoint(t, z, res_per_level)
    diag = {k: jnp.where(active[k], diag[k] + mass[k], 1.0) for k in mass}
    return apply_A, diag


def boundary_rhs(
    blocks: Sequence[StressBlock],
    mass: UField,
    guess: UField,
    active: UField,
    res_per_level,
) -> UField:
    """rhs = M guess - D^T (W b) (cpp:2453-2456, 2772)."""
    taus = [
        b.weight * b.boundary if b.boundary is not None else jnp.zeros_like(b.weight)
        for b in blocks
    ]
    bt = apply_DT(blocks, taus, mass, res_per_level)
    return {
        k: jnp.where(active[k], mass[k] * guess[k] - bt[k], 0.0) for k in mass
    }


# ---------------------------------------------------------------------------
# Pytree vector algebra + preconditioned CG
# ---------------------------------------------------------------------------


def tree_dot(x: UField, y: UField):
    return sum(jnp.vdot(x[k], y[k]) for k in x)


def tree_axpy(a, x: UField, y: UField) -> UField:
    return {k: a * x[k] + y[k] for k in x}


def pcg(
    apply_A,
    rhs: UField,
    x0: UField,
    diag: UField,
    tolerance: float,
    max_iterations: int,
):
    """Jacobi-preconditioned conjugate gradient over pytree vectors.

    Matches Eigen::ConjugateGradient's convergence rule: stop when
    ||r||_2 <= tol * ||b||_2 (cpp:611-631).  Returns (x, iterations,
    relative_residual).
    """
    inv_diag = {k: 1.0 / diag[k] for k in diag}

    b_norm2 = tree_dot(rhs, rhs)
    threshold = tolerance * tolerance * b_norm2

    r0 = {k: rhs[k] - v for k, v in apply_A(x0).items()}
    z0 = {k: inv_diag[k] * r0[k] for k in r0}
    rz0 = tree_dot(r0, z0)

    def cond(state):
        _, r, _, _, rz, it = state
        return (tree_dot(r, r) > threshold) & (it < max_iterations)

    def body(state):
        x, r, z, p, rz, it = state
        ap = apply_A(p)
        alpha = rz / tree_dot(p, ap)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, ap, r)
        z = {k: inv_diag[k] * r[k] for k in r}
        rz_new = tree_dot(r, z)
        beta = rz_new / rz
        p = tree_axpy(beta, p, z)
        return x, r, z, p, rz_new, it + 1

    state = (x0, r0, z0, z0, rz0, jnp.asarray(0, jnp.int32))
    x, r, _, _, _, iters = jax.lax.while_loop(cond, body, state)
    rel = jnp.sqrt(tree_dot(r, r) / jnp.maximum(b_norm2, 1e-300))
    return x, iters, rel


# ---------------------------------------------------------------------------
# Flat-packed CG: carry ONE contiguous vector instead of 12 pyramid arrays.
# On the device the per-array dispatch overhead of pytree vector ops dominates
# the CG's non-matvec cost; packing makes every dot/axpy a single-kernel pass.
# Unpacking for the matvec is free (contiguous slice + reshape); repacking is
# one concatenate.
# ---------------------------------------------------------------------------


def make_packer(shapes: Dict[Tuple[int, int], Tuple[int, int, int]]):
    import math

    keys = sorted(shapes)
    sizes = [math.prod(shapes[k]) for k in keys]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    def pack(tree: UField) -> jnp.ndarray:
        return jnp.concatenate([tree[k].reshape(-1) for k in keys])

    def unpack(flat: jnp.ndarray) -> UField:
        return {
            k: flat[offsets[i]:offsets[i + 1]].reshape(shapes[k])
            for i, k in enumerate(keys)
        }

    return pack, unpack


def _flat_pcg(A, b, x0, invd, threshold, max_iterations, dot=None,
              precond=None, cancel_poll: int = 0):
    """Flat-vector PCG core: iterate while ``||r||^2 > threshold``.

    z is never carried: the preconditioned residual is folded into the
    rz dot and the p update, and ||r||^2 is carried for the stopping test
    (one fewer full-vector pass per iteration each).
    ``dot`` overrides the inner product — a distributed (shard_map) solve
    passes a ``psum``-reduced vdot so every device agrees on the scalars.
    ``precond`` overrides the default Jacobi ``z = invd * r`` with any
    fixed SPD map (e.g. :func:`make_chebyshev_precond`).
    ``cancel_poll > 0`` checks the process-global cancellation flag
    (``utils.cancel`` — the reference's ``boss->opInterrupt()`` analog)
    every that-many iterations through a host ``io_callback`` and exits the
    loop early when set.
    Returns (x, iterations, ||r||^2).
    """
    if dot is None:
        dot = jnp.vdot
    if precond is None:
        def precond(r):
            return invd * r
    r0 = b - A(x0)
    rr0 = dot(r0, r0)
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(state):
        _, _, _, _, rr, it, stop = state
        return (rr > threshold) & (it < max_iterations) & jnp.logical_not(stop)

    def body(state):
        x, r, p, rz, rr, it, stop = state
        ap = A(p)
        alpha = rz / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rr = dot(r, r)
        z = precond(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        it = it + 1
        if cancel_poll > 0:
            from jax.experimental import io_callback

            from .utils import cancel as _cancel

            stop = jax.lax.cond(
                it % cancel_poll == 0,
                lambda: io_callback(
                    _cancel.poll_host,
                    jax.ShapeDtypeStruct((), jnp.bool_),
                    ordered=False,
                ),
                lambda: jnp.asarray(False),
            )
        return x, r, p, rz_new, rr, it, stop

    state = (x0, r0, z0, rz0, rr0, jnp.asarray(0, jnp.int32),
             jnp.asarray(False))
    x, _, _, _, rr, iters, _ = jax.lax.while_loop(cond, body, state)
    return x, iters, rr


def estimate_lambda_max(A, invd, v0, dot=None, iters: int = 12):
    """Largest eigenvalue of the Jacobi-scaled operator ``B = invd*A`` by
    power iteration, returned as the D-inner-product Rayleigh quotient
    (``B`` is similar to the symmetric ``D^-1/2 A D^-1/2``, so its spectrum
    is real positive; the quotient is exact for the converged vector and a
    lower bound otherwise — callers pad with a safety factor).
    """
    if dot is None:
        dot = jnp.vdot

    eps = jnp.asarray(1e-30, v0.dtype)

    def body(_, v):
        w = invd * A(v)
        return w * jax.lax.rsqrt(dot(w, w) + eps)

    v = v0 * jax.lax.rsqrt(dot(v0, v0) + eps)
    v = jax.lax.fori_loop(0, iters, body, v)
    av = A(v)
    # Rayleigh quotient in the D-inner product: (v, A v) / (v, D v)
    return dot(v, av) / (dot(v, v / invd) + eps)


def make_chebyshev_precond(A, invd, lam_max, degree: int,
                           lam_min_ratio: float = 1.0 / 30.0):
    """Fixed SPD Chebyshev polynomial preconditioner ``z ~= A^-1 r``.

    Runs ``degree`` Chebyshev semi-iterations on the Jacobi-scaled system
    (zero initial guess) targeting the interval
    ``[lam_min_ratio*lam_max, lam_max]``.  The resulting map is a fixed
    polynomial ``p(B)*invd`` with ``p > 0`` on the spectrum, hence symmetric
    positive definite in the A-geometry — a valid CG preconditioner.

    Why: each PCG iteration pays fixed overhead (kernel launches for the
    matvec glue, dot-product syncs) on top of the matvec itself; a degree-k
    polynomial preconditioner cuts the iteration count ~k-fold while paying
    k extra matvecs, so the per-iteration overhead amortizes over k+1
    applies.  The stopping rule (true residual) is unchanged, so the solve
    meets the same tolerance as the reference's Jacobi-CG
    (/root/reference/Source/HDK_AdaptiveViscosity.cpp:611-631) in far fewer
    synchronized iterations.
    """
    # ODD degrees only: the preconditioner polynomial p satisfies
    # 1 - lam*p(lam) = T_k((theta-lam)/delta)/T_k(sigma), and for any
    # eigenvalue ABOVE b the argument drops below -1 where T_k -> +inf for
    # even k (p flips negative -> indefinite preconditioner -> CG
    # stagnates; measured: degree 2 on the beam scene burned the full
    # iteration budget at residual 6e-4) but -inf for odd k (p stays
    # positive).  The power-iteration lam_max estimate is a lower bound, so
    # eigenvalues above b are expected; odd degree makes the map robust to
    # that, even degrees are silently promoted.
    if degree % 2 == 0:
        degree += 1
    lam_max = lam_max * 1.05  # safety: the power-iteration estimate is a
    # lower bound; Chebyshev diverges on eigenvalues above ``b``
    a = lam_min_ratio * lam_max
    b = lam_max
    theta = 0.5 * (b + a)
    delta = 0.5 * (b - a)
    sigma = theta / delta

    def precond(r):
        z = (1.0 / theta) * (invd * r)
        d = z
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (
                invd * (r - A(z))
            )
            z = z + d
            rho = rho_new
        return z

    return precond


def pcg_flat(apply_A, rhs: UField, x0: UField, diag: UField,
             tolerance: float, max_iterations: int,
             cheb_degree: int = 1, cancel_poll: int = 0):
    """Same math as :func:`pcg`, with flat-vector state (single-kernel
    dots/axpys).  ``apply_A`` still maps grid pytrees to grid pytrees.

    ``cheb_degree > 1`` swaps the Jacobi preconditioner for a fixed
    degree-``cheb_degree`` Chebyshev polynomial (see
    :func:`make_chebyshev_precond`); the reported iteration count is then
    the number of OUTER CG iterations (each costing ``cheb_degree + 1``
    operator applies, plus a 12-apply one-time spectral-bound estimate).
    ``cancel_poll`` — see :func:`_flat_pcg`."""
    shapes = {k: tuple(v.shape) for k, v in rhs.items()}
    pack, unpack = make_packer(shapes)

    def A(flat):
        return pack(apply_A(unpack(flat)))

    b = pack(rhs)
    invd = 1.0 / pack(diag)
    b_norm2 = jnp.vdot(b, b)
    threshold = tolerance * tolerance * b_norm2
    precond = None
    if cheb_degree > 1:
        lam = estimate_lambda_max(A, invd, b)
        precond = make_chebyshev_precond(A, invd, lam, cheb_degree)
    x, iters, rr = _flat_pcg(A, b, pack(x0), invd, threshold, max_iterations,
                             precond=precond, cancel_poll=cancel_poll)
    rel = jnp.sqrt(rr / jnp.maximum(b_norm2, 1e-300))
    return unpack(x), iters, rel


def pcg_refined(apply_A_hi, apply_A_lo, rhs: UField, x0: UField, diag: UField,
                tolerance: float, max_iterations: int,
                inner_tolerance: float = 1e-4, max_outer: int = 40):
    """Mixed-precision solve: fp32 Jacobi-CG inner solves inside an
    iterative-refinement outer loop whose residual is re-formed in the
    rhs's (high) precision.

    The reference's build-time precision switch offers an fp64 (default) or
    fp32 solve (USESINGLEPRECISION, /root/reference/Source/HDK_Utilities.h:25-37).
    On TPU the fast path is fp32; fp64 accuracy is recovered the classical
    way: solve ``A d = r`` in fp32, accumulate ``x += d`` and re-form
    ``r = b - A x`` in fp64, repeat.  The correction equation has the same
    (Jacobi-scaled) conditioning as the original system, so each outer pass
    gains ~``inner_tolerance`` in true residual until the fp64 limit.

    ``apply_A_hi`` must act on ``rhs``-precision pytrees; ``apply_A_lo`` on
    float32 pytrees of the same structure.  Returns
    (x, total_inner_iterations, relative_residual) — the stopping rule is the
    same ``||r||_2 <= tol * ||b||_2`` as :func:`pcg`, with ``r`` exact in
    high precision.
    """
    shapes = {k: tuple(v.shape) for k, v in rhs.items()}
    pack, unpack = make_packer(shapes)
    lo = jnp.float32

    def A_hi(flat):
        return pack(apply_A_hi(unpack(flat)))

    def A_lo(flat):
        return pack(apply_A_lo(unpack(flat)))

    b = pack(rhs)
    x = pack(x0)
    hi = b.dtype
    invd_lo = (1.0 / pack(diag)).astype(lo)

    b_norm2 = jnp.vdot(b, b)
    threshold = tolerance * tolerance * b_norm2
    itol2 = jnp.asarray(inner_tolerance, lo) ** 2

    def outer_cond(state):
        _, r, tot, outer = state
        return (
            (jnp.vdot(r, r) > threshold)
            & (tot < max_iterations)
            & (outer < max_outer)
        )

    def outer_body(state):
        x, r, tot, outer = state
        r_lo = r.astype(lo)
        inner_threshold = itol2 * jnp.vdot(r_lo, r_lo)
        d, it, _ = _flat_pcg(
            A_lo, r_lo, jnp.zeros_like(r_lo), invd_lo,
            inner_threshold, max_iterations - tot,
        )
        x = x + d.astype(hi)
        r = b - A_hi(x)
        return x, r, tot + it, outer + 1

    r0 = b - A_hi(x)
    state = (x, r0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    x, r, iters, _ = jax.lax.while_loop(outer_cond, outer_body, state)
    rel = jnp.sqrt(jnp.vdot(r, r) / jnp.maximum(b_norm2, 1e-300))
    return unpack(x), iters, rel
