"""fp32 inner CG + fp64 iterative refinement (pcg_refined).

The BASELINE.md target: the fp64 (Eigen-default) residual trajectory is
reproduced by fp32 Jacobi-CG wrapped in iterative refinement — the TPU-native
reading of the reference's USESINGLEPRECISION switch
(/root/reference/Source/HDK_Utilities.h:25-37).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import operator
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.solver import solve_viscosity
from tests.test_operator import build_case, lib_operator
from tests.test_solver import state_from_case


def test_pcg_refined_reaches_beyond_fp32_accuracy():
    """On the adaptive fixture, pcg_refined with an fp32 inner solver must
    drive the *fp64* residual to 1e-10 relative — far below what a single
    fp32 CG solve can reach — while the inner apply genuinely runs in fp32."""
    case = build_case()
    blocks, mass, active, apply_A, diag, rpl = lib_operator(case)
    assert mass[(0, 0)].dtype == jnp.float64  # x64 fixture

    cast32 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    apply_A32, _ = operator.make_operator(cast32(blocks), cast32(mass), active, rpl)

    inner_dtypes = []

    def apply_lo_checked(u):
        inner_dtypes.extend({v.dtype for v in u.values()})
        return apply_A32(u)

    rng = np.random.default_rng(7)
    rhs = {k: jnp.where(active[k], jnp.asarray(rng.normal(size=v.shape)), 0.0)
           for k, v in mass.items()}
    x0 = {k: jnp.zeros_like(v) for k, v in mass.items()}

    x, iters, rel = jax.jit(lambda rhs, x0: operator.pcg_refined(
        apply_A, apply_lo_checked, rhs, x0, diag, 1e-10, 4000))(rhs, x0)

    assert set(inner_dtypes) == {jnp.dtype(jnp.float32)}, inner_dtypes
    assert int(iters) > 0
    assert float(rel) <= 1e-10

    # true fp64 residual agrees with the reported one
    r = {k: rhs[k] - v for k, v in apply_A(x).items()}
    num = np.sqrt(sum(float(jnp.vdot(r[k], r[k])) for k in r))
    den = np.sqrt(sum(float(jnp.vdot(rhs[k], rhs[k])) for k in rhs))
    assert num / den <= 1.5e-10


def test_solver_refined_matches_fp64_solve():
    """Full pipeline: use_iterative_refinement=True matches the plain fp64
    solve to 1e-5 relative L-infinity on the written velocity field."""
    case = build_case()
    state = state_from_case(case)
    cfg = SolverConfig(octree_levels=case["levels"], tolerance=1e-9,
                       max_iterations=4000)
    cfg_ref = dataclasses.replace(cfg, use_iterative_refinement=True)

    r64 = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, case["dt"])
    rref = jax.jit(lambda s, t: solve_viscosity(s, t, cfg_ref))(state, case["dt"])

    assert float(rref.stats.residual) <= 1e-9
    scale = max(float(jnp.max(jnp.abs(v))) for v in r64.velocity)
    for a in range(3):
        diff = float(jnp.max(jnp.abs(rref.velocity[a] - r64.velocity[a])))
        assert diff / scale < 1e-5, (a, diff, scale)
