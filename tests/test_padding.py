"""Automatic domain padding: any resolution is legal input.

The reference stretches arbitrary input resolutions to the containing power
of two and clamps ACTIVE cells to the original region
(/root/reference/Source/HDK_OctreeGrid.cpp:10-24).  solve_viscosity pads to
the next 2^(levels-1) multiple with INACTIVE cells and crops the output
back; these tests prove (a) the padded solve matches the oracle-assembled
system at an odd size end-to-end through writeback, and (b) internal padding
equals explicitly pre-padding the state (to 1 ulp — the two entry shapes
compile different programs, and XLA fusion choices differ across them).
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify, fields, octree
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.solver import (
    FluidState,
    _pad_state,
    padded_shape,
    solve_viscosity,
)
from tests.oracle import reference_oracle as oracle
from tests.test_operator import oracle_system


def _odd_state(n=18, seed=5, dtype=jnp.float64):
    """Analytic liquid ball + floor at an off-multiple resolution."""
    rng = np.random.default_rng(seed)
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    liquid = np.sqrt((X - 0.5) ** 2 + (Y - 0.55) ** 2 + (Z - 0.5) ** 2) - 0.3
    solid = Y - 0.2
    fshapes = [tuple(n + (1 if d == a else 0) for d in range(3)) for a in range(3)]
    vel = [rng.normal(size=s) for s in fshapes]
    svel = [rng.normal(size=s) * 0.1 for s in fshapes]
    return FluidState(
        liquid_sdf=jnp.asarray(liquid, dtype),
        solid_sdf=jnp.asarray(solid, dtype),
        velocity=tuple(jnp.asarray(v, dtype) for v in vel),
        solid_velocity=tuple(jnp.asarray(v, dtype) for v in svel),
        viscosity=jnp.asarray(1.0 + 0.5 * X + 0.25 * Y, dtype),
        density=jnp.asarray(1.0 + 0.3 * Z, dtype),
        dx=dx,
    )


def _case_from_state(state: FluidState, cfg: SolverConfig):
    """Oracle-ready case dict from explicit (already padded) fields — the
    same topology pipeline test_operator.build_case runs."""
    dx = state.dx
    extrap = cfg.extrapolation * dx
    levels = cfg.octree_levels

    @jax.jit
    def topo(liquid, solid):
        mask = octree.build_refinement_mask(liquid, solid, dx, extrap,
                                            3 * dx, 2 * dx)
        labels = octree.build_octree(mask, levels)
        cw, ew = fields.integration_weights(liquid, solid, 3, extrap, False)
        fw = fields.face_weights(liquid, solid, 3, extrap, False)
        vk = classify.classify_octree_velocity(labels, cw, ew, solid, extrap)
        ek = classify.classify_edge_stress(labels, ew)
        ck = classify.classify_center_stress(labels, cw)
        return labels, cw, ew, fw, vk, ek, ck

    jl, cw, ew, fw, vk, ek, ck = topo(state.liquid_sdf, state.solid_sdf)
    return dict(
        dx=dx, dt=0.01, extrap=extrap, cfg=cfg, levels=levels,
        labels=[np.asarray(l) for l in jl],
        cw=np.asarray(cw), ew=[np.asarray(e) for e in ew],
        fw=[np.asarray(f) for f in fw],
        vk=[[np.asarray(vk[l][a]) for a in range(3)] for l in range(levels)],
        ek=[[np.asarray(ek[l][a]) for a in range(3)] for l in range(levels)],
        ck=[np.asarray(ck[l]) for l in range(levels)],
        viscosity=np.asarray(state.viscosity),
        density=np.asarray(state.density),
        solid=np.asarray(state.solid_sdf),
        solid_vel=[np.asarray(v) for v in state.solid_velocity],
        regular_vel=[np.asarray(v) for v in state.velocity],
    )


def test_autopad_solve_matches_oracle_scipy():
    """An 18^3 input (indivisible by 2^(levels-1)=4) solved end-to-end must
    match a scipy solve of the oracle system assembled on the 20^3 padded
    fields, through writeback — the C4 pow2-padding parity evidence."""
    n = 18
    cfg = SolverConfig(octree_levels=3, tolerance=1e-12, max_iterations=4000)
    state = _odd_state(n=n)
    assert padded_shape(state.liquid_sdf.shape, 3) == (20, 20, 20)

    result = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, 0.01)
    assert float(result.stats.residual) < 1e-10
    assert result.velocity[0].shape == (n + 1, n, n)

    padded = _pad_state(state, (20, 20, 20))
    case = _case_from_state(padded, cfg)
    osys = oracle_system(case)
    assert int(result.stats.octree_dofs) == osys["n_vel"]
    # the assembled system can be exactly singular (a zero-mass fluid
    # component carries a rigid-motion null space); spsolve NaNs there,
    # while CG-from-guess converges to the guess-projected solution.  The
    # library solves with Jacobi-PCG from the restricted-velocity guess, so
    # the oracle must do the same to land on the same null-space component.
    d = osys["A"].diagonal()
    minv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 1.0)
    M = spla.LinearOperator(osys["A"].shape, matvec=lambda v: minv * v)
    x, info = spla.cg(osys["A"], osys["rhs"], x0=osys["guess"],
                      rtol=1e-13, atol=0.0, maxiter=8000, M=M)
    assert info == 0 or info > 0, info

    u_grids = {}
    for l, per_axis in enumerate(osys["vel_idx"]):
        for a, idx in enumerate(per_axis):
            u_grids[(l, a)] = np.where(idx >= 0, x[np.clip(idx, 0, None)], 0.0)
    oi = oracle.OracleInterpolator(case["labels"], u_grids, osys["vel_idx"])

    for a in range(3):
        rk = oracle.classify_regular_velocity(
            case["cw"], case["ew"], case["solid"], case["extrap"], a
        )
        okind = case["vk"][0][a]
        oidx = osys["vel_idx"][0][a]
        got = np.asarray(result.velocity[a])
        want = np.array(case["regular_vel"][a])
        for face in zip(*np.nonzero(rk != oracle.UNASSIGNED)):
            if rk[face] == oracle.SOLIDBOUNDARY:
                want[face] = case["solid_vel"][a][face]
            elif oidx[face] >= 0:
                want[face] = x[oidx[face]]
            elif okind[face] == oracle.SOLIDBOUNDARY:
                want[face] = case["solid_vel"][a][face]
            elif okind[face] == oracle.UNASSIGNED:
                pos = [face[d] if d == a else face[d] + 0.5 for d in range(3)]
                want[face] = oi.interp(pos, a)
        # crop the padded oracle grid back to the caller's resolution
        crop = tuple(slice(0, n + (1 if d == a else 0)) for d in range(3))
        np.testing.assert_allclose(got, want[crop], rtol=2e-7, atol=1e-8,
                                   err_msg=f"axis {a}")


def test_autopad_equals_prepadded():
    """Internal padding vs explicitly pre-padding: identical topology
    (DOFs, iterations) and velocities equal to 1 ulp.  The two runs see
    identical padded VALUES but are different XLA programs (one carries the
    entry pad ops), and pad-op presence changes fusion choices — measured
    as <= 1-ulp diffs on a handful of tiny interpolated faces — so exact
    bitwise equality across the two programs is not a stable contract.
    A realistic FLIP resolution: 68^3 pads to 72^3 at 4 levels (68 is
    already 4-divisible, so 3 levels would not pad)."""
    from adaptiveviscositysolver_tpu import scenes

    n = 68
    cfg = SolverConfig(octree_levels=4, tolerance=1e-4, max_iterations=12,
                       dtype=jnp.float32)
    state = scenes.buckling(n=n, dtype=jnp.float32)
    target = padded_shape(state.liquid_sdf.shape, 4)
    assert target == (72, 72, 72)

    out = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, 0.01)
    pre = _pad_state(state, target)
    out_pre = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(pre, 0.01)

    assert int(out.stats.octree_dofs) == int(out_pre.stats.octree_dofs)
    assert int(out.stats.iterations) == int(out_pre.stats.iterations)
    for a in range(3):
        crop = tuple(slice(0, n + (1 if d == a else 0)) for d in range(3))
        want = np.asarray(out_pre.velocity[a])[crop]
        scale = max(np.abs(want).max(), 1e-30)
        np.testing.assert_allclose(  # f32 roundoff on the field scale
            np.asarray(out.velocity[a]), want, rtol=0, atol=1e-5 * scale,
        )


def test_make_solver_autopad_probe():
    """make_solver's probe/window machinery must handle an off-multiple
    resolution (probe pads identically; windows stay consistent)."""
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.solver import make_solver

    cfg = SolverConfig(octree_levels=3, tolerance=1e-5, max_iterations=100,
                       dtype=jnp.float32)
    state = scenes.beam(n=18, dtype=jnp.float32)
    solve = make_solver(cfg)
    out = solve(state, 0.01)
    assert out.velocity[0].shape == (19, 18, 18)
    assert int(out.stats.octree_dofs) > 0
    # repeat frame reuses the compiled program
    solve(state, 0.01)
    assert solve.cache_info()["programs"] == 1


@pytest.mark.smoke
def test_autopad_equals_prepadded_smoke():
    """Fast tier of test_autopad_equals_prepadded: 18^3 -> 20^3 at 3
    levels, 6 fixed iterations — the same internal-vs-explicit padding
    contract at a compile size a 1-core host turns around in ~2 min."""
    n = 18
    cfg = SolverConfig(octree_levels=3, tolerance=1e-30, max_iterations=6,
                       dtype=jnp.float32)
    state = _odd_state(n=n)
    target = padded_shape(state.liquid_sdf.shape, 3)
    assert target == (20, 20, 20)

    out = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, 0.01)
    pre = _pad_state(state, target)
    out_pre = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(pre, 0.01)

    assert int(out.stats.octree_dofs) == int(out_pre.stats.octree_dofs)
    assert int(out.stats.iterations) == int(out_pre.stats.iterations)
    for a in range(3):
        crop = tuple(slice(0, n + (1 if d == a else 0)) for d in range(3))
        want = np.asarray(out_pre.velocity[a])[crop]
        scale = max(np.abs(want).max(), 1e-30)
        np.testing.assert_allclose(  # f32 roundoff on the field scale
            np.asarray(out.velocity[a]), want, rtol=0, atol=1e-5 * scale,
        )
