"""Pallas fused matvec == v1 whole-array matvec, on every topology fixture.

The Pallas kernels (ops/pallas_apply.py) re-derive every stencil case
(T1-T5, C1-C2, mass) in-register; this test pins them, element for element,
to the oracle-verified v1 operator.  Runs in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify, operator
from adaptiveviscositysolver_tpu.ops import pallas_apply
from tests.test_operator import build_case, lib_operator


def _to_f32(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "split"])
@pytest.mark.parametrize(
    "kind", ["adaptive", "uniform", "nosolid", "noenh", "tx2", "bbox"]
)
def test_pallas_apply_matches_v1(kind, fused):
    case = build_case(
        uniform=(kind == "uniform"),
        with_solid=(kind != "nosolid"),
        enhanced=(kind != "noenh"),
    )
    blocks, mass, active, _, _, rpl = lib_operator(case)
    blocks = _to_f32(blocks)
    mass = _to_f32(mass)
    apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)

    levels = case["levels"]
    # "bbox" pins active-region cropping: canonical boxes shrunk to the
    # occupied windows (solver.probe_topology's static crop) must give the
    # identical operator on every in-window DOF — and there are no
    # out-of-window DOFs by construction (octree.occupied_bboxes).
    bboxes = None
    if kind == "bbox":
        from adaptiveviscositysolver_tpu import octree
        from adaptiveviscositysolver_tpu.solver import _tight_windows

        raw = jax.jit(octree.occupied_bboxes)(case["jlabels"])
        bboxes = _tight_windows([np.asarray(b) for b in raw], rpl)
    # "tx2" pins the big-level layout (TX=2 < MAX_HALO, PX=2): slab DMAs
    # start inside the second pad tile, the configuration that can overrun
    # the buffer if the x padding is miscomputed.
    frame, canons = pallas_apply.build_frame_data(
        case["jlabels"], case["jvk"], case["jek"], case["jck"],
        blocks, mass, rpl,
        force_tx=2 if kind == "tx2" else None,
        bboxes=bboxes,
    )
    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, case["dx"],
        enhanced=(kind != "noenh"), interpret=True, fused=fused,
    )

    rng = np.random.default_rng(11)
    u = {
        k: jnp.where(
            active[k],
            jnp.asarray(rng.normal(size=mass[k].shape), jnp.float32),
            0.0,
        ).astype(jnp.float32)
        for k in mass
    }

    want = jax.jit(apply_v1)(u)
    got = crop_tree(jax.jit(apply_pl)(embed_tree(u)))

    for k in sorted(mass):
        w = np.asarray(want[k])
        g = np.asarray(got[k])
        scale = max(np.abs(w).max(), 1e-30)
        np.testing.assert_allclose(
            g, w, rtol=0, atol=3e-5 * scale,
            err_msg=f"level/axis {k} ({kind})",
        )


def test_solver_pallas_impl_matches_default():
    """Full pipeline with apply_impl='pallas' (interpret mode on CPU) agrees
    with the default apply through writeback, at fp32 accuracy."""
    import jax

    from adaptiveviscositysolver_tpu.config import SolverConfig
    from adaptiveviscositysolver_tpu.solver import solve_viscosity
    from tests.test_solver import state_from_case

    case = build_case(n=8, levels=2)
    state = state_from_case(case)
    cfg = SolverConfig(octree_levels=case["levels"], tolerance=1e-5,
                       apply_impl="v1-fused")
    # the test states are float64 (conftest x64): an explicit fp32 cast is
    # required since the pallas path refuses a silent fp64 downcast
    cfg_pl = SolverConfig(octree_levels=case["levels"], tolerance=1e-5,
                          apply_impl="pallas", dtype=jnp.float32)
    want = jax.jit(lambda s, t: solve_viscosity(s, t, cfg))(state, case["dt"])
    got = jax.jit(lambda s, t: solve_viscosity(s, t, cfg_pl))(state, case["dt"])
    assert float(got.stats.residual) <= 1e-5
    scale = max(float(jnp.max(jnp.abs(v))) for v in want.velocity)
    for a in range(3):
        diff = float(jnp.max(jnp.abs(got.velocity[a] - want.velocity[a])))
        assert diff / scale < 5e-4, (a, diff, scale)


def test_solver_pallas_bbox_solve_matches_v1():
    """End-to-end active-region cropping: a pallas solve on the
    probe_topology crop windows (the make_solver fast path on a scene whose
    fluid occupies a corner of the domain) equals the v1 solve through
    writeback."""
    import dataclasses

    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig
    from adaptiveviscositysolver_tpu.solver import (
        probe_topology, solve_viscosity,
    )

    # window_quantum=2: the production 16-cell snap makes every window
    # trivial on a domain this small — tight (quantum-2) windows keep the
    # fixture cheap for interpret mode while really exercising the crop
    state = scenes.beam(n=16, dtype=jnp.float32)
    cfg = SolverConfig(octree_levels=2, tolerance=1e-6, max_iterations=200,
                       apply_impl="pallas", dtype=jnp.float32)
    lv, bboxes = probe_topology(state, cfg, window_quantum=2)
    assert any(
        bb != ((0, r), (0, r), (0, r))
        for bb, r in zip(bboxes, [16 >> l for l in range(lv)])
    ), "beam fixture should produce a nontrivial crop window"
    cfg = dataclasses.replace(cfg, octree_levels=lv)
    cfg_v1 = dataclasses.replace(cfg, apply_impl="v1-fused")
    dt = 0.01

    want = jax.jit(lambda s, t: solve_viscosity(s, t, cfg_v1))(state, dt)
    got = jax.jit(
        lambda s, t: solve_viscosity(s, t, cfg, pallas_bboxes=bboxes)
    )(state, dt)
    assert float(got.stats.residual) <= 1e-6
    scale = max(float(jnp.max(jnp.abs(v))) for v in want.velocity)
    for a in range(3):
        diff = float(jnp.max(jnp.abs(got.velocity[a] - want.velocity[a])))
        assert diff / scale < 5e-4, (a, diff, scale)


@pytest.mark.smoke
def test_pallas_apply_matches_v1_smoke():
    """Smoke-tier representative of the pallas-vs-v1 equality class: the
    adaptive fused kernel only (each interpret-mode kernel compile costs
    ~2.5 min on a 1-core host, so the full kind x fused matrix stays in
    the exhaustive tier)."""
    test_pallas_apply_matches_v1("adaptive", True)


def test_pallas_apply_mixed_modes_matches_v1():
    """Per-level fused/split routing (the >128^3 VMEM path,
    pallas_apply.level_modes): a mixed-mode operator must equal v1 exactly
    like the uniform-mode ones."""
    case = build_case()
    blocks, mass, active, _, _, rpl = lib_operator(case)
    blocks = _to_f32(blocks)
    mass = _to_f32(mass)
    apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)
    frame, canons = pallas_apply.build_frame_data(
        case["jlabels"], case["jvk"], case["jek"], case["jck"],
        blocks, mass, rpl,
    )
    modes = ["split" if l % 2 == 0 else "fused" for l in range(case["levels"])]
    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, case["dx"],
        enhanced=True, interpret=True, fused=modes,
    )
    rng = np.random.default_rng(13)
    u = {k: jnp.where(active[k],
                      jnp.asarray(rng.normal(size=mass[k].shape), jnp.float32),
                      0.0).astype(jnp.float32) for k in mass}
    want = jax.jit(apply_v1)(u)
    got = crop_tree(jax.jit(apply_pl)(embed_tree(u)))
    for k in sorted(mass):
        w, g = np.asarray(want[k]), np.asarray(got[k])
        scale = max(np.abs(w).max(), 1e-30)
        np.testing.assert_allclose(g, w, rtol=0, atol=3e-5 * scale,
                                   err_msg=f"level/axis {k}")


@pytest.mark.parametrize("n,blevels", [(16, "all"), (40, "level0")],
                         ids=["ky1", "ky2"])
def test_pallas_apply_brick_matches_v1(n, blevels):
    """y-brick routing (the big-plane path past the split VMEM wall,
    pallas_apply.level_modes -> ("brick", TY)): bricked kernels DMA
    aligned y slices into fresh VMEM buffers and write outputs (plus the
    zero y pads) by manual DMA — must equal v1 exactly like the
    whole-plane lowerings.

    ``ky1`` (n=16): one y brick — both edge-pad branches fire in the same
    program.  ``ky2`` (n=40): two y bricks — interior brick boundaries
    exercise the halo DMA and the first/last-brick pad writes separately,
    with level 0 bricked and the coarse levels on the normal fused path
    (the realistic mixed routing)."""
    case = build_case(n=n)
    blocks, mass, active, _, _, rpl = lib_operator(case)
    blocks = _to_f32(blocks)
    mass = _to_f32(mass)
    apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)
    levels = case["levels"]
    if blevels == "all":
        modes = [("brick", 32)] * levels
    else:
        modes = [("brick", 32)] + ["fused"] * (levels - 1)
    frame, canons = pallas_apply.build_frame_data(
        case["jlabels"], case["jvk"], case["jek"], case["jck"],
        blocks, mass, rpl, modes=modes,
    )
    assert canons[0].TY == 32
    if blevels == "level0":
        assert canons[0].KY == 2, canons[0]
    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, case["dx"],
        enhanced=True, interpret=True, fused=modes,
    )
    rng = np.random.default_rng(17)
    u = {k: jnp.where(active[k],
                      jnp.asarray(rng.normal(size=mass[k].shape), jnp.float32),
                      0.0).astype(jnp.float32) for k in mass}
    want = jax.jit(apply_v1)(u)
    got_c = jax.jit(apply_pl)(embed_tree(u))
    # the bricked outputs' canonical pads must be EXACT zeros (the CG flat
    # vector spans the whole canonical box, pads included)
    for (l, f), arr in got_c.items():
        a = np.asarray(arr)
        c = canons[l]
        assert (a[:, :c.off[1], :] == 0).all(), (l, f, "y lo pad")
        assert (a[:, c.off[1] + c.cap[1]:, :] == 0).all(), (l, f, "y hi pad")
    got = crop_tree(got_c)
    for k in sorted(mass):
        w, g = np.asarray(want[k]), np.asarray(got[k])
        scale = max(np.abs(w).max(), 1e-30)
        np.testing.assert_allclose(g, w, rtol=0, atol=3e-5 * scale,
                                   err_msg=f"level/axis {k}")
