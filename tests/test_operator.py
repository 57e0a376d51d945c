"""Matrix-free operator vs the fully-assembled oracle system.

The strongest correctness evidence in the suite: the library's dense
term-bundle operator must match, entry for entry, a scipy matrix assembled
from a per-DOF transcription of the reference's stencils — and the
reference's per-velocity enumeration (C19) must itself equal the variational
form M + D^T W D the library uses.
"""

import functools

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify, fields, octree, operator, restriction, stencils
from adaptiveviscositysolver_tpu.config import SolverConfig
from tests.oracle import reference_oracle as oracle


def build_case(n=16, levels=3, with_solid=True, uniform=False, enhanced=True,
               seed=0, solid_weights=False, compat=False):
    rng = np.random.default_rng(seed)
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    liquid = np.sqrt((X - 0.5) ** 2 + (Y - 0.55) ** 2 + (Z - 0.5) ** 2) - 0.28
    if with_solid:
        solid = Y - 0.22
        # liquid pool below y=0.3 (extends into the floor, as FLIP SDFs do)
        liquid = np.minimum(liquid, Y - 0.3)
    else:
        solid = np.full_like(liquid, 1e3)
    viscosity = 1.0 + 0.5 * X + 0.25 * Y
    density = 1.0 + 0.3 * Z
    dt = 0.01
    extrap = 0.5 * dx
    cfg = SolverConfig(octree_levels=1 if uniform else levels,
                       use_enhanced_gradients=enhanced,
                       apply_solid_weights=solid_weights,
                       compat_edge_boundary_component=compat)
    if uniform:
        levels = 1

    @jax.jit
    def topo(liquid, solid, viscosity, density):
        mask = octree.build_refinement_mask(liquid, solid, dx, extrap, 3 * dx, 2 * dx)
        if uniform:
            mask = jnp.zeros_like(mask)
        labels = octree.build_octree(mask, levels)
        cw, ew = fields.integration_weights(liquid, solid, 3, extrap, solid_weights)
        fw = fields.face_weights(liquid, solid, 3, extrap, solid_weights)
        vel_kinds = classify.classify_octree_velocity(labels, cw, ew, solid, extrap)
        edge_kinds = classify.classify_edge_stress(labels, ew)
        center_kinds = classify.classify_center_stress(labels, cw)
        return labels, cw, ew, fw, vel_kinds, edge_kinds, center_kinds

    jl, cw, ew, fw, vk, ek, ck = topo(
        jnp.asarray(liquid), jnp.asarray(solid), jnp.asarray(viscosity), jnp.asarray(density)
    )

    # solid velocity: smooth nonzero face fields to exercise boundary RHS
    fshapes = [tuple(n + (1 if d == a else 0) for d in range(3)) for a in range(3)]
    solid_vel = [rng.normal(size=s) * 0.1 + 0.05 * a for a, s in enumerate(fshapes)]
    regular_vel = [rng.normal(size=s) for s in fshapes]

    return dict(
        n=n, dx=dx, dt=dt, extrap=extrap, cfg=cfg, levels=levels,
        liquid=liquid, solid=solid, viscosity=viscosity, density=density,
        labels=[np.asarray(l) for l in jl], jlabels=jl,
        cw=np.asarray(cw), ew=[np.asarray(e) for e in ew], fw=[np.asarray(f) for f in fw],
        vk=[[np.asarray(vk[l][a]) for a in range(3)] for l in range(levels)],
        ek=[[np.asarray(ek[l][a]) for a in range(3)] for l in range(levels)],
        ck=[np.asarray(ck[l]) for l in range(levels)],
        jvk=vk, jek=ek, jck=ck, jcw=cw, jew=ew, jfw=fw,
        solid_vel=solid_vel, regular_vel=regular_vel,
    )


def oracle_system(case):
    """Assemble A, rhs, diag from the oracle (variational form)."""
    vel_idx, n_vel = oracle.index_pyramid(case["vk"])
    edge_idx, _ = oracle.index_pyramid(case["ek"])
    center_flat, _ = oracle.assign_indices(case["ck"])
    edge_rows, center_rows = oracle.build_rows_data(
        case["labels"], vel_idx, edge_idx, center_flat,
        case["ew"], case["cw"], case["viscosity"], case["solid_vel"],
        case["dt"], case["dx"], case["cfg"].use_enhanced_gradients,
        compat_edge_boundary=case["cfg"].compat_edge_boundary_component,
    )
    D, W, b = oracle.build_D_W_b(edge_rows, center_rows, n_vel)
    mass = oracle.build_mass(case["labels"], vel_idx, case["fw"], case["density"], n_vel)
    guess = oracle.build_guess(case["labels"], vel_idx, case["regular_vel"], n_vel)
    A, rhs = oracle.assemble_variational(D, W, b, mass, guess)
    return dict(vel_idx=vel_idx, n_vel=n_vel, edge_idx=edge_idx,
                center_idx=center_flat, edge_rows=edge_rows,
                center_rows=center_rows, D=D, W=W, b=b, mass=mass,
                guess=guess, A=A, rhs=rhs)


def lib_operator(case):
    res_per_level = [tuple(s.shape) for s in case["labels"]]
    sv = [jnp.asarray(v) for v in case["solid_vel"]]
    blocks = stencils.build_edge_stress_blocks(
        case["jlabels"], case["jvk"], case["jek"], case["jew"],
        jnp.asarray(case["viscosity"]), sv, case["dt"], case["dx"], case["cfg"],
    ) + stencils.build_center_stress_blocks(
        case["jlabels"], case["jvk"], case["jck"], case["jcw"],
        jnp.asarray(case["viscosity"]), sv, case["dt"], case["dx"], case["cfg"],
    )
    mass = stencils.build_mass(
        case["jlabels"], case["jvk"], case["jfw"], jnp.asarray(case["density"])
    )
    active = {
        (l, a): case["jvk"][l][a] == classify.FLUID
        for l in range(case["levels"]) for a in range(3)
    }
    apply_A, diag = operator.make_operator(blocks, mass, active, res_per_level)
    return blocks, mass, active, apply_A, diag, res_per_level


def vec_to_grids(vec, vel_idx):
    out = {}
    for l, per_axis in enumerate(vel_idx):
        for a, idx in enumerate(per_axis):
            out[(l, a)] = jnp.asarray(
                np.where(idx >= 0, vec[np.clip(idx, 0, None)], 0.0)
            )
    return out


def grids_to_vec(grids, vel_idx, n_vel):
    vec = np.zeros(n_vel)
    for l, per_axis in enumerate(vel_idx):
        for a, idx in enumerate(per_axis):
            sel = idx >= 0
            vec[idx[sel]] = np.asarray(grids[(l, a)])[sel]
    return vec


CASES = {
    "uniform": dict(uniform=True),
    "adaptive": dict(),
    "adaptive_noenh": dict(enhanced=False),
    "adaptive_nosolid": dict(with_solid=False),
    # setScaleDivideThreshold solid-weight rescale meets the assembled
    # system (cpp:728-790)
    "adaptive_solidw": dict(solid_weights=True),
    # the reference's cpp:1901 edge-axis solid-boundary RHS, vs an oracle
    # transcribing the same quirk (solid_vel is nonzero in these fixtures)
    "adaptive_compat": dict(compat=True),
}


@pytest.fixture(scope="module", params=[
    # the base adaptive case is the smoke-tier representative of the
    # operator-vs-oracle equality class (covers cross-level + solid terms)
    pytest.param(k, marks=pytest.mark.smoke) if k == "adaptive" else k
    for k in CASES])
def setup(request):
    case = build_case(**CASES[request.param])
    return case, oracle_system(case), lib_operator(case)


def test_matvec_matches_oracle(setup):
    case, osys, (blocks, mass, active, apply_A, diag, rpl) = setup
    rng = np.random.default_rng(1)
    apply_j = jax.jit(apply_A)
    for trial in range(3):
        x = rng.normal(size=osys["n_vel"])
        want = osys["A"] @ x
        got_grids = apply_j(vec_to_grids(x, osys["vel_idx"]))
        got = grids_to_vec(got_grids, osys["vel_idx"], osys["n_vel"])
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_diag_matches_oracle(setup):
    case, osys, (blocks, mass, active, apply_A, diag, rpl) = setup
    want = osys["A"].diagonal()
    got = grids_to_vec(diag, osys["vel_idx"], osys["n_vel"])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_rhs_matches_oracle(setup):
    case, osys, (blocks, mass, active, apply_A, diag, rpl) = setup
    guess = restriction.restrict_velocity_pyramid(
        [jnp.asarray(v) for v in case["regular_vel"]], case["levels"]
    )
    # restriction itself must match the oracle BFS
    gvec = grids_to_vec(guess, osys["vel_idx"], osys["n_vel"])
    np.testing.assert_allclose(gvec, osys["guess"], rtol=1e-10, atol=1e-12)
    rhs = operator.boundary_rhs(blocks, mass, guess, active, rpl)
    got = grids_to_vec(rhs, osys["vel_idx"], osys["n_vel"])
    np.testing.assert_allclose(got, osys["rhs"], rtol=1e-9, atol=1e-10)


def test_enumerated_assembly_equals_variational(setup):
    """The reference's per-velocity-DOF walk (cpp:2459-2777) builds exactly
    M + D^T W D — validating the library's matrix-free architecture."""
    case, osys, _ = setup
    A2, rhs2 = oracle.assemble_enumerated(
        case["labels"], osys["vel_idx"], osys["edge_idx"], osys["center_idx"],
        osys["n_vel"], osys["edge_rows"], osys["center_rows"],
        osys["mass"], osys["guess"], case["cfg"].use_enhanced_gradients,
    )
    diff = (osys["A"] - A2).tocoo()
    max_err = np.abs(diff.data).max() if diff.nnz else 0.0
    assert max_err < 1e-10, f"enumerated != variational (max {max_err})"
    np.testing.assert_allclose(rhs2, osys["rhs"], rtol=1e-9, atol=1e-10)


def test_operator_spd(setup):
    case, osys, _ = setup
    A = osys["A"]
    asym = abs(A - A.T).max()
    assert asym < 1e-12
    if osys["n_vel"] < 4000:
        from scipy.sparse.linalg import eigsh

        lam = eigsh(A, k=1, which="SA", return_eigenvectors=False)[0]
        assert lam > 0, f"not SPD: min eig {lam}"


def test_export_sparse_system_matches_oracle(setup):
    """Host-side scipy export of the system equals the oracle assembly."""
    from adaptiveviscositysolver_tpu import export, restriction

    case, osys, (blocks, mass, active, apply_A, diag, rpl) = setup
    guess = restriction.restrict_velocity_pyramid(
        [jnp.asarray(v) for v in case["regular_vel"]], case["levels"]
    )
    guess = {k: jnp.where(active[k], guess[k], 0.0) for k in active}
    A, rhs, vel_idx, n = export.export_sparse_system(
        blocks, mass, case["jvk"], guess, rpl
    )
    assert n == osys["n_vel"]
    for l in range(case["levels"]):
        for a in range(3):
            np.testing.assert_array_equal(vel_idx[l][a], osys["vel_idx"][l][a])
    diff = (A - osys["A"]).tocoo()
    max_err = np.abs(diff.data).max() if diff.nnz else 0.0
    assert max_err < 1e-9, max_err
    np.testing.assert_allclose(rhs, osys["rhs"], rtol=1e-9, atol=1e-10)


def test_compat_edge_boundary_rhs_differs():
    """Guard against the compat fixture passing vacuously: with a nonzero
    solid velocity the cpp:1901 edge-axis sampling must actually change the
    boundary RHS (and both modes are covered against their own oracle via
    the adaptive / adaptive_compat cases)."""
    case = build_case()
    vel_idx, n_vel = oracle.index_pyramid(case["vk"])
    edge_idx, _ = oracle.index_pyramid(case["ek"])
    rows = {}
    for flag in (False, True):
        b = []
        for level in range(case["levels"]):
            for axis in range(3):
                grid = edge_idx[level][axis]
                for e in zip(*np.nonzero(grid >= 0)):
                    _, bnd = oracle.edge_stress_row(
                        e, level, axis, vel_idx, case["labels"],
                        case["solid_vel"], case["dx"], True,
                        compat_edge_boundary=flag,
                    )
                    b.append(sum(bnd))
        rows[flag] = np.asarray(b)
    assert np.abs(rows[True]).max() > 0
    assert np.abs(rows[True] - rows[False]).max() > 1e-6


def test_fused_apply_equals_materialized(setup):
    """Rebuilding terms per matvec (the CG-loop bandwidth optimization)
    must produce the identical operator."""
    case, osys, (blocks, mass, active, apply_A, diag, rpl) = setup
    sv = [jnp.asarray(v) for v in case["solid_vel"]]

    def terms_builder():
        return stencils.build_edge_stress_blocks(
            case["jlabels"], case["jvk"], case["jek"], case["jew"],
            jnp.asarray(case["viscosity"]), sv, case["dt"], case["dx"],
            case["cfg"], with_weights=False,
        ) + stencils.build_center_stress_blocks(
            case["jlabels"], case["jvk"], case["jck"], case["jcw"],
            jnp.asarray(case["viscosity"]), sv, case["dt"], case["dx"],
            case["cfg"], with_weights=False,
        )

    apply_fused, diag2 = operator.make_operator(
        blocks, mass, active, rpl, terms_builder=terms_builder
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=osys["n_vel"])
    u = vec_to_grids(x, osys["vel_idx"])
    a1 = jax.jit(apply_A)(u)
    a2 = jax.jit(apply_fused)(u)
    for k in a1:
        np.testing.assert_allclose(np.asarray(a2[k]), np.asarray(a1[k]),
                                   rtol=1e-12, atol=1e-14)
