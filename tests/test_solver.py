"""End-to-end solve: exactness properties + full parity vs a scipy solve."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.solver import FluidState, solve_viscosity
from tests.oracle import reference_oracle as oracle
from tests.test_operator import build_case, oracle_system


def state_from_case(case, velocity=None):
    n = case["n"]
    if velocity is None:
        velocity = case["regular_vel"]
    return FluidState(
        liquid_sdf=jnp.asarray(case["liquid"]),
        solid_sdf=jnp.asarray(case["solid"]),
        velocity=tuple(jnp.asarray(v) for v in velocity),
        solid_velocity=tuple(jnp.asarray(v) for v in case["solid_vel"]),
        viscosity=jnp.asarray(case["viscosity"]),
        density=jnp.asarray(case["density"]),
        dx=case["dx"],
    )


def rigid_rotation_faces(n, dx, omega=(0.4, -0.3, 0.7), center=0.5):
    """u = omega x (r - c) sampled at the three face grids."""
    fields = []
    for a in range(3):
        shape = tuple(n + (1 if d == a else 0) for d in range(3))
        coords = []
        for d in range(3):
            c = np.arange(shape[d], dtype=np.float64)
            c = c * dx if d == a else (c + 0.5) * dx
            coords.append(c)
        X = np.meshgrid(*coords, indexing="ij")
        r = [X[d] - center for d in range(3)]
        o = omega
        u = [
            o[1] * r[2] - o[2] * r[1],
            o[2] * r[0] - o[0] * r[2],
            o[0] * r[1] - o[1] * r[0],
        ]
        fields.append(u[a])
    return fields


def test_rigid_rotation_is_exact_solution():
    """Rigid motion has zero strain rate: D u = 0, so the solve must return
    the input immediately (0 CG iterations) and writeback must reproduce it
    at every written face — including through the T-junction interpolator."""
    case = build_case(with_solid=False)
    rigid = rigid_rotation_faces(case["n"], case["dx"])
    state = state_from_case(case, velocity=rigid)
    cfg = SolverConfig(octree_levels=case["levels"], tolerance=1e-6)
    result = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, 0.01)
    assert int(result.stats.iterations) == 0
    for a in range(3):
        rk = np.asarray(
            classify.classify_regular_velocity(
                case["jcw"], case["jew"], jnp.asarray(case["solid"]),
                case["extrap"], a,
            )
        )
        written = rk == classify.FLUID
        got = np.asarray(result.velocity[a])
        np.testing.assert_allclose(
            got[written], rigid[a][written], rtol=1e-7, atol=1e-9,
            err_msg=f"axis {a}",
        )


@pytest.mark.parametrize("kind", [
    "uniform", pytest.param("adaptive", marks=pytest.mark.smoke), "solidw"])
def test_solve_matches_scipy(kind):
    """Full pipeline vs scipy solve of the oracle-assembled system, through
    writeback (direct faces, solid faces, interpolated faces).  The
    ``solidw`` case runs the solid-weight rescale (setScaleDivideThreshold,
    cpp:728-790) end-to-end through the solver."""
    case = build_case(uniform=(kind == "uniform"),
                      solid_weights=(kind == "solidw"))
    osys = oracle_system(case)
    cfg = SolverConfig(octree_levels=case["levels"], tolerance=1e-12,
                       max_iterations=4000,
                       apply_solid_weights=(kind == "solidw"))
    state = state_from_case(case)
    result = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, case["dt"])
    assert float(result.stats.residual) < 1e-10
    assert int(result.stats.octree_dofs) == osys["n_vel"]

    x = spla.spsolve(osys["A"].tocsc(), osys["rhs"])

    # oracle writeback (cpp:2815-2894)
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
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-8,
                                   err_msg=f"axis {a}")


def test_solve_damps_shear():
    """A sheared velocity field must lose kinetic energy, converge within
    tolerance, and leave untouched faces alone."""
    case = build_case()
    rng = np.random.default_rng(3)
    vel = [v * 0.0 for v in case["regular_vel"]]
    n = case["n"]
    y = (np.arange(n) + 0.5) / n
    vel[0] = np.broadcast_to(
        np.sin(2 * np.pi * y)[None, :, None], (n + 1, n, n)
    ).copy()
    state = state_from_case(case, velocity=vel)
    cfg = SolverConfig(octree_levels=case["levels"], tolerance=1e-8)
    result = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, 0.05)
    assert 0 < int(result.stats.iterations) < cfg.max_iterations
    assert float(result.stats.residual) <= 1e-8
    rk = np.asarray(
        classify.classify_regular_velocity(
            case["jcw"], case["jew"], jnp.asarray(case["solid"]), case["extrap"], 0
        )
    )
    written = rk == classify.FLUID
    e_before = float(np.sum(vel[0][written] ** 2))
    e_after = float(np.sum(np.asarray(result.velocity[0])[written] ** 2))
    assert e_after < e_before
    untouched = rk == classify.UNASSIGNED
    np.testing.assert_array_equal(
        np.asarray(result.velocity[0])[untouched], vel[0][untouched]
    )


def test_async_probe_solver_matches_sync():
    """make_solver's async-probe mode (one fetch per frame, one-frame-stale
    crop windows + violation redo) returns the same velocities and stats as
    the synchronous-probe mode — including across a topology CHANGE that
    violates the stale windows (frame 2 is a different scene)."""
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.solver import make_solver

    cfg = SolverConfig(octree_levels=3, tolerance=1e-6, max_iterations=200,
                       dtype=jnp.float32)
    frames = [scenes.beam(n=16), scenes.buckling(n=16), scenes.buckling(n=16)]
    dt = 0.01

    sync = make_solver(cfg, async_probe=False)
    asyn = make_solver(cfg, async_probe=True)
    for i, state in enumerate(frames):
        want = sync(state, dt)
        got = asyn(state, dt)
        assert int(got.stats.iterations) == int(want.stats.iterations), i
        assert abs(float(got.stats.residual) - float(want.stats.residual)) \
            <= 1e-5 * max(float(want.stats.residual), 1e-30), i
        assert int(got.stats.octree_dofs) == int(want.stats.octree_dofs), i
        for a in range(3):
            np.testing.assert_allclose(
                np.asarray(got.velocity[a]), np.asarray(want.velocity[a]),
                rtol=0, atol=1e-6, err_msg=f"frame {i} axis {a}")
