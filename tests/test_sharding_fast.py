"""Cheap multi-chip evidence (VERDICT r4 #5).

Two fast checks that keep the distributed path verifiable every round
without the >80-CPU-minute interpret-mode solves in test_sharding.py:

* the per-solve COLLECTIVE COUNT is pinned by *lowering* (tracing only —
  no XLA compile) the sharded CG and counting collective-permute /
  all-reduce ops in the StableHLO.  The halo-exchange structure
  (parallel/shard_pallas.py: one left+right ppermute pair per halo'd
  array — frame prep once, iterate + cross-level views per apply; one
  psum per CG dot) is comms volume the design promises; a refactor that
  changes it must change this test consciously.
* the driver's multichip dryrun (``__graft_entry__.dryrun_multichip``)
  runs as a bounded subprocess — the same artifact gate the driver
  records, re-checkable locally.  Marked ``sharded`` (minutes, compile
  dominated).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from adaptiveviscositysolver_tpu import classify, fields, octree, operator, \
    restriction, scenes, stencils
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.ops import pallas_apply
from adaptiveviscositysolver_tpu.parallel import shard_pallas


def _build_inputs(n=16, levels=2):
    """The solver's pre-CG products for a tiny buckling scene (float32)."""
    state = scenes.buckling(n=n, dtype=jnp.float32)
    cfg = SolverConfig(octree_levels=levels)
    dx = state.dx
    dt = jnp.float32(0.01)
    extrap = cfg.extrapolation * dx
    cw, ew = fields.integration_weights(
        state.liquid_sdf, state.solid_sdf, 3, extrap, False)
    fw = fields.face_weights(state.liquid_sdf, state.solid_sdf, 3, extrap, False)
    mask = octree.build_refinement_mask(
        state.liquid_sdf, state.solid_sdf, dx, extrap, 3 * dx, 2 * dx)
    labels = octree.build_octree(mask, levels)
    vk = classify.classify_octree_velocity(labels, cw, ew, state.solid_sdf, extrap)
    ek = classify.classify_edge_stress(labels, ew)
    ck = classify.classify_center_stress(labels, cw)
    blocks = stencils.build_edge_stress_blocks(
        labels, vk, ek, ew, state.viscosity, state.solid_velocity, dt, dx, cfg,
    ) + stencils.build_center_stress_blocks(
        labels, vk, ck, cw, state.viscosity, state.solid_velocity, dt, dx, cfg,
    )
    mass = stencils.build_mass(labels, vk, fw, state.density)
    rpl = [tuple(l.shape) for l in labels]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}
    _, diag = operator.make_operator(blocks, mass, active, rpl)
    guess = restriction.restrict_velocity_pyramid(list(state.velocity), levels)
    guess = {k: jnp.where(active[k], guess[k], 0.0) for k in mass}
    # rhs = M u^n - D^T(W b) with u^n = the restricted guess (exactly what
    # solver.py feeds boundary_rhs).  A zero u^n here makes rhs identically
    # zero on a zero-solid-velocity scene, which turns the relative
    # residual into inf/nan and runs every solve to max_iterations.
    rhs = operator.boundary_rhs(blocks, mass, guess, active, rpl)
    f32 = jnp.float32
    we = {(b.level, b.axis): b.weight.astype(f32)
          for b in blocks if b.kind == "edge"}
    wc_by_level = {}
    for b in blocks:
        if b.kind == "center" and b.level not in wc_by_level:
            wc_by_level[b.level] = b.weight.astype(f32)
    wc = [wc_by_level[l] for l in range(levels)]

    def c32(tree):
        return {k: v.astype(f32) for k, v in tree.items()}

    return (vk, ek, ck, we, wc, c32(mass), active, c32(rhs), c32(guess),
            c32(diag), rpl, dx)


def test_sharded_collective_counts_pinned():
    """Lower (never compile) the 2-device sharded CG; the ppermute and
    all-reduce counts must match the designed comms structure exactly."""
    levels, n_mesh = 2, 2
    (vk, ek, ck, we, wc, mass, active, rhs, guess, diag, rpl, dx) = \
        _build_inputs(n=16, levels=levels)
    mesh = Mesh(np.array(jax.devices("cpu")[:n_mesh]), ("x",))

    def run():
        return shard_pallas.sharded_pallas_pcg(
            mesh, "x", vk, ek, ck, we, wc, mass, active, rhs, guess, diag,
            rpl, dx, True, 1e-4, 5, interpret=True)

    txt = jax.jit(run).lower().as_text()
    n_ppermute = txt.count("collective_permute")
    n_allreduce = txt.count("all_reduce")

    # frame prep (once per solve): one (left, right) ppermute pair per
    # halo'd per-frame array — each kind FIELD is halo-filled before
    # bit-packing (7 fields per level + 3 parent-kind fields below the
    # top), plus 3 edge weights + 1 center weight per level
    frame_fields = sum(
        sum(len(g) for g in pallas_apply._pack_groups(l, levels)) + 3 + 1
        for l in range(levels))
    # per apply: the iterate (3 faces per level) + cross-level views
    # (3 up per non-top level, 3 cs per non-bottom level), a pair each
    per_apply = 2 * (3 * levels + 3 * (levels - 1) * 2)
    # _flat_pcg evaluates A twice in the lowered module: the initial
    # residual and the single traced loop body — so the PER-ITERATION
    # comms volume is exactly ``per_apply`` permutes + 3 all-reduced dots
    want_ppermute = 2 * frame_fields + 2 * per_apply
    # psum dots: b_norm2, rr0, rz0 at init; (p,ap), rr, rz in the body
    want_allreduce = 6
    assert n_ppermute == want_ppermute, (n_ppermute, want_ppermute)
    assert n_allreduce == want_allreduce, (n_allreduce, want_allreduce)


@pytest.mark.sharded
def test_dryrun_multichip_subprocess():
    """The driver's multichip gate, bounded: sharded interpret-mode Pallas
    CG on an 8-device CPU mesh vs the v1 reference (see __graft_entry__)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, timeout=900, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout
