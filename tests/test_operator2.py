"""Halo-padded (v2) operator and flat-packed CG vs the v1 reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import operator, operator2, stencils
from tests.test_operator import CASES, build_case, lib_operator


@pytest.fixture(scope="module", params=["adaptive", "adaptive_nosolid"])
def v2case(request):
    case = build_case(**CASES[request.param])
    return case, lib_operator(case)


def _random_u(case, active, mass, seed=11):
    rng = np.random.default_rng(seed)
    return {
        k: jnp.asarray(
            np.where(np.asarray(active[k]), rng.normal(size=mass[k].shape), 0.0)
        )
        for k in mass
    }


def test_v2_matches_v1(v2case):
    case, (blocks, mass, active, apply_A, diag, rpl) = v2case
    u = _random_u(case, active, mass)
    bp = operator2.pad_block_data(blocks)
    apply2, pad_tree, unpad_tree = operator2.make_operator2(bp, mass, active, rpl)
    a1 = jax.jit(apply_A)(u)
    a2 = unpad_tree(jax.jit(apply2)(pad_tree(u)))
    for k in a1:
        np.testing.assert_allclose(np.asarray(a2[k]), np.asarray(a1[k]),
                                   rtol=1e-12, atol=1e-13, err_msg=str(k))


def test_v2_fused_matches_v1(v2case):
    case, (blocks, mass, active, apply_A, diag, rpl) = v2case
    u = _random_u(case, active, mass)
    sv = [jnp.asarray(v) for v in case["solid_vel"]]
    HS = operator2.HS

    def terms_builder():
        pvk, pek, pck = operator2.pad_kinds(case["jvk"], case["jek"], case["jck"])
        plab = [operator2.pad_halo(l, HS) for l in case["jlabels"]]
        psv = [operator2.pad_halo(v, HS) for v in sv]
        pew = [operator2.pad_halo(w, HS) for w in case["jew"]]
        pcw = operator2.pad_halo(case["jcw"], HS)
        return stencils.build_edge_stress_blocks(
            plab, pvk, pek, pew, jnp.asarray(case["viscosity"]), psv,
            case["dt"], case["dx"], case["cfg"], with_weights=False, halo=HS,
        ) + stencils.build_center_stress_blocks(
            plab, pvk, pck, pcw, jnp.asarray(case["viscosity"]), psv,
            case["dt"], case["dx"], case["cfg"], with_weights=False,
        )

    bp = operator2.pad_block_data(blocks)
    apply2, pad_tree, unpad_tree = operator2.make_operator2(
        bp, mass, active, rpl, terms_builder=terms_builder
    )
    a1 = jax.jit(apply_A)(u)
    a2 = unpad_tree(jax.jit(apply2)(pad_tree(u)))
    for k in a1:
        np.testing.assert_allclose(np.asarray(a2[k]), np.asarray(a1[k]),
                                   rtol=1e-12, atol=1e-13, err_msg=str(k))


def test_flat_pcg_matches_tree_pcg(v2case):
    case, (blocks, mass, active, apply_A, diag, rpl) = v2case
    from adaptiveviscositysolver_tpu import restriction

    guess = restriction.restrict_velocity_pyramid(
        [jnp.asarray(v) for v in case["regular_vel"]], case["levels"]
    )
    guess = {k: jnp.where(active[k], guess[k], 0.0) for k in active}
    rhs = operator.boundary_rhs(blocks, mass, guess, active, rpl)

    x1, it1, r1 = jax.jit(
        lambda: operator.pcg(apply_A, rhs, guess, diag, 1e-10, 500)
    )()
    x2, it2, r2 = jax.jit(
        lambda: operator.pcg_flat(apply_A, rhs, guess, diag, 1e-10, 500)
    )()
    assert abs(int(it1) - int(it2)) <= 2  # only dot-product rounding differs
    for k in x1:
        np.testing.assert_allclose(np.asarray(x2[k]), np.asarray(x1[k]),
                                   rtol=1e-7, atol=1e-9)
