"""Chebyshev polynomial preconditioner (operator.make_chebyshev_precond).

Matrix-level properties, independent of the solver pipeline: on an SPD
system with a wide spectrum the degree-k polynomial preconditioner must
(a) converge to the same solution under the same true-residual stopping
rule, and (b) cut the OUTER CG iteration count several-fold — the whole
point of paying k matvecs per iteration (amortizing per-iteration launch
and dot-sync overhead on device).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adaptiveviscositysolver_tpu import operator


def _spd_system(n=400, cond=3e3, seed=0):
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(n, n))
    evals = np.logspace(0, np.log10(cond), n)
    a = (q * evals) @ q.T
    a = 0.5 * (a + a.T)
    b = rng.randn(n)
    return a.astype(np.float64), b.astype(np.float64)


def test_chebyshev_matches_jacobi_and_cuts_iterations():
    a_np, b_np = _spd_system()
    a = jnp.asarray(a_np)
    diag = {(0, 0): jnp.asarray(np.diag(a_np))}
    rhs = {(0, 0): jnp.asarray(b_np)}
    x0 = {(0, 0): jnp.zeros_like(rhs[(0, 0)])}

    def apply_a(tree):
        return {(0, 0): a @ tree[(0, 0)]}

    tol = 1e-8
    x_j, it_j, rel_j = operator.pcg_flat(apply_a, rhs, x0, diag, tol, 10000)
    x_c, it_c, rel_c = operator.pcg_flat(apply_a, rhs, x0, diag, tol, 10000,
                                         cheb_degree=4)
    assert float(rel_j) <= tol
    assert float(rel_c) <= tol
    want = np.linalg.solve(a_np, b_np)
    # ||r|| <= tol*||b|| bounds the error by cond(A)*tol in norm, not
    # elementwise: compare with an absolute floor scaled to the solution
    atol = 1e-5 * float(np.linalg.norm(want))
    np.testing.assert_allclose(np.asarray(x_j[(0, 0)]), want, rtol=1e-4,
                               atol=atol)
    np.testing.assert_allclose(np.asarray(x_c[(0, 0)]), want, rtol=1e-4,
                               atol=atol)
    # degree 4 must cut outer iterations at least ~2.5x (typically ~4x)
    assert int(it_c) * 2.5 < int(it_j), (int(it_c), int(it_j))


def test_chebyshev_precond_is_spd():
    """The polynomial map must be symmetric positive definite (CG validity):
    check z = M^-1 r is linear-symmetric via random probes."""
    a_np, _ = _spd_system(n=120, cond=1e3, seed=1)
    a = jnp.asarray(a_np)
    invd = jnp.asarray(1.0 / np.diag(a_np))

    def apply_a(v):
        return a @ v

    lam = operator.estimate_lambda_max(apply_a, invd,
                                       jnp.ones(a_np.shape[0]))
    precond = operator.make_chebyshev_precond(apply_a, invd, lam, 4)
    rng = np.random.RandomState(2)
    for _ in range(3):
        u = jnp.asarray(rng.randn(a_np.shape[0]))
        v = jnp.asarray(rng.randn(a_np.shape[0]))
        lhs = float(jnp.vdot(u, precond(v)))
        rhs_ = float(jnp.vdot(precond(u), v))
        assert abs(lhs - rhs_) <= 1e-8 * max(abs(lhs), 1.0)
        pos = float(jnp.vdot(u, precond(u)))
        assert pos > 0.0


def test_even_degree_is_safe_under_lambda_underestimate():
    """Even-degree Chebyshev polynomials flip sign on eigenvalues above the
    estimated lam_max (T_k -> +inf below -1 for even k), turning the
    preconditioner indefinite — measured as a full-budget CG stall on the
    beam scene at degree 2.  make_chebyshev_precond promotes even degrees
    to odd; under a deliberately underestimated lam_max the map must stay
    positive definite and CG must still converge."""
    a_np, b_np = _spd_system(n=200, cond=1e3, seed=3)
    a = jnp.asarray(a_np)
    invd = jnp.asarray(1.0 / np.diag(a_np))

    def apply_a(v):
        return a @ v

    # worst case: lam_max underestimated by far more than the 5% safety pad
    lam_true = float(np.max(np.abs(np.linalg.eigvalsh(
        a_np / np.diag(a_np)[:, None]))))
    precond = operator.make_chebyshev_precond(apply_a, invd,
                                              0.7 * lam_true, 2)
    rng = np.random.RandomState(4)
    for _ in range(3):
        u = jnp.asarray(rng.randn(a_np.shape[0]))
        assert float(jnp.vdot(u, precond(u))) > 0.0

    diag = {(0, 0): jnp.asarray(np.diag(a_np))}
    rhs = {(0, 0): jnp.asarray(b_np)}
    x0 = {(0, 0): jnp.zeros_like(rhs[(0, 0)])}

    def apply_tree(tree):
        return {(0, 0): a @ tree[(0, 0)]}

    _, it, rel = operator.pcg_flat(apply_tree, rhs, x0, diag, 1e-8, 10000,
                                   cheb_degree=2)
    assert float(rel) <= 1e-8
    assert int(it) < 10000


def test_config_rejects_even_cheb_degree():
    """SolverConfig refuses even degrees > 1 up front (ADVICE r4): the
    silent odd-promotion in make_chebyshev_precond would otherwise run
    degree+1 applies against the documented cost model."""
    from adaptiveviscositysolver_tpu.config import SolverConfig

    with pytest.raises(ValueError, match="odd"):
        SolverConfig(cheb_degree=2)
    SolverConfig(cheb_degree=3)  # odd is fine
