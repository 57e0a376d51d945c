"""Topology maps, checkpointing, native module, and input validation."""

import numpy as np
import pytest

import jax.numpy as jnp

from adaptiveviscositysolver_tpu import native, scenes, topology
from adaptiveviscositysolver_tpu.solver import FluidState, _validate_state
from adaptiveviscositysolver_tpu.utils import checkpoint
from tests.oracle import reference_oracle as oracle


@pytest.mark.smoke
def test_topology_maps_match_oracle():
    rng = np.random.default_rng(0)
    pts = rng.integers(2, 30, size=(50, 3))
    for p in pts:
        p = tuple(int(v) for v in p)
        jp = jnp.asarray(p, jnp.int32)
        for axis in range(3):
            for d in (0, 1):
                assert tuple(topology.cell_to_face(jp, axis, d).tolist()) == \
                    oracle.cell_to_face(p, axis, d)
                assert tuple(topology.face_to_cell(jp, axis, d).tolist()) == \
                    oracle.face_to_cell(p, axis, d)
                assert tuple(topology.cell_to_cell(jp, axis, d).tolist()) == \
                    oracle.cell_to_cell(p, axis, d)
            for i in range(4):
                assert tuple(topology.cell_to_edge(jp, axis, i).tolist()) == \
                    oracle.cell_to_edge(p, axis, i)
                assert tuple(topology.edge_to_cell(jp, axis, i).tolist()) == \
                    oracle.edge_to_cell(p, axis, i)
                assert tuple(topology.face_to_node(jp, axis, i).tolist()) == \
                    oracle.face_to_node(p, axis, i)
                assert tuple(topology.node_to_face(jp, axis, i).tolist()) == \
                    oracle.node_to_face(p, axis, i)
            for ea in range(3):
                if ea == axis:
                    continue
                for d in (0, 1):
                    assert tuple(topology.face_to_edge(jp, axis, ea, d).tolist()) == \
                        oracle.face_to_edge(p, axis, ea, d)
                    assert tuple(topology.edge_to_face(jp, ea, axis, d).tolist()) == \
                        oracle.edge_to_face(p, ea, axis, d)
                for ci in (0, 1):
                    assert tuple(
                        topology.child_edge_in_face(jp, axis, ea, ci).tolist()
                    ) == oracle.child_edge_in_face(p, axis, ea, ci)
        for i in range(8):
            assert tuple(topology.cell_to_node(jp, i).tolist()) == \
                oracle.cell_to_node(p, i)
            assert tuple(topology.node_to_cell(jp, i).tolist()) == \
                oracle.node_to_cell(p, i)
            assert tuple(topology.child_cell(jp, i).tolist()) == \
                oracle.child_cell(p, i)
        for axis in range(3):
            for i in range(4):
                assert tuple(topology.child_face(jp, axis, i).tolist()) == \
                    oracle.child_face(p, axis, i)
        assert tuple(topology.parent(jp).tolist()) == oracle.parent(p)


def test_checkpoint_roundtrip(tmp_path):
    state = scenes.beam(n=8)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state, step=7)
    restored, step = checkpoint.load(path)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored.liquid_sdf),
                                  np.asarray(state.liquid_sdf))
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(restored.velocity[a]),
                                      np.asarray(state.velocity[a]))
    assert restored.dx == state.dx


def test_validate_state_rejects_bad_shapes():
    state = scenes.beam(n=8)
    _validate_state(state)  # good state passes
    import dataclasses

    bad = dataclasses.replace(state, viscosity=state.viscosity[:-1])
    with pytest.raises(ValueError, match="viscosity"):
        _validate_state(bad)
    bad = dataclasses.replace(
        state, velocity=(state.velocity[1],) + tuple(state.velocity[1:])
    )
    with pytest.raises(ValueError, match="face-sampled"):
        _validate_state(bad)


def test_native_ply_fallback_matches(tmp_path):
    from adaptiveviscositysolver_tpu import octree

    mask = np.zeros((8, 8, 8), np.int8)
    mask[:4] = 1
    labels = [np.asarray(l) for l in octree.build_octree(jnp.asarray(mask), 2)]
    out = str(tmp_path / "oct.ply")
    n = native.export_octree_ply(labels, 0.125, out)
    data = open(out, "rb").read(200)
    assert b"ply" in data and n > 0
    fails = native.check_octree_invariants(labels)
    assert fails == []


def test_flip_demo_loop_runs():
    from adaptiveviscositysolver_tpu.config import SolverConfig
    from adaptiveviscositysolver_tpu.models import flip

    state = scenes.buckling(n=16, dtype=jnp.float64)
    cfg = SolverConfig(octree_levels=2, max_iterations=40, tolerance=1e-5)
    out, stats = flip.simulate(state, frames=2, dt=1 / 48.0, config=cfg)
    assert len(stats) == 2
    assert all(np.isfinite(np.asarray(out.velocity[a])).all() for a in range(3))
    # the column is falling: vertical momentum stays negative
    assert float(np.asarray(out.velocity[1]).mean()) < 0.0


def test_compat_edge_boundary_and_dtype():
    """compat_edge_boundary_component only perturbs the solid-boundary RHS
    (it must actually perturb it when the solid moves — the oracle-parity
    coverage for both modes is in test_operator's adaptive/adaptive_compat
    cases); config.dtype casts the solve."""
    import dataclasses

    import jax

    from adaptiveviscositysolver_tpu.config import SolverConfig
    from adaptiveviscositysolver_tpu.solver import solve_viscosity

    state = scenes.buckling(n=16, dtype=jnp.float64)
    # a moving solid: uniform sideways floor velocity plus a vertical ramp,
    # so the edge-axis and face-axis samples genuinely differ
    rng = np.random.default_rng(7)
    state = dataclasses.replace(state, solid_velocity=tuple(
        jnp.asarray(0.5 + 0.3 * a + 0.1 * rng.normal(size=v.shape))
        for a, v in enumerate(state.solid_velocity)
    ))
    base = SolverConfig(octree_levels=2, max_iterations=60, tolerance=1e-6)
    compat = SolverConfig(octree_levels=2, max_iterations=60, tolerance=1e-6,
                          compat_edge_boundary_component=True)
    r1 = jax.jit(lambda s, t: solve_viscosity(s, t, base))(state, 0.01)
    r2 = jax.jit(lambda s, t: solve_viscosity(s, t, compat))(state, 0.01)
    d = max(float(jnp.max(jnp.abs(r1.velocity[a] - r2.velocity[a])))
            for a in range(3))
    assert d > 1e-9, "compat flag changed nothing despite a moving solid"
    for a in range(3):
        assert np.isfinite(np.asarray(r2.velocity[a])).all()
    # dtype plumbing: the cast solve stays within fp32-CG truncation of the
    # fp64 answer.  Tolerances past ~1e-4 make plain fp32 CG *worse* here
    # (stagnation noise accumulates; measured 0.021 max diff at 1e-6 vs
    # 0.006 at 1e-4) — recovering full precision is what
    # use_iterative_refinement is for (tests/test_refinement.py).
    f32cfg = SolverConfig(octree_levels=2, max_iterations=60, tolerance=1e-4,
                          dtype=jnp.float32)
    r3 = jax.jit(lambda s, t: solve_viscosity(s, t, f32cfg))(state, 0.01)
    assert r3.velocity[0].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(r3.velocity[0]),
                               np.asarray(r1.velocity[0]), atol=1e-2)
