"""T-junction node interpolator vs the loop-transcribed oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify, interpolator
from tests.oracle import reference_oracle as oracle
from tests.test_operator import build_case


@pytest.fixture(scope="module", params=[
    pytest.param("adaptive", marks=pytest.mark.smoke),
    "adaptive_nosolid", "uniform"])
def icase(request):
    kwargs = {
        "adaptive": {},
        "adaptive_nosolid": dict(with_solid=False),
        "uniform": dict(uniform=True),
    }[request.param]
    case = build_case(**kwargs)
    rng = np.random.default_rng(7)
    u = {}
    for l in range(case["levels"]):
        for a in range(3):
            kind = case["vk"][l][a]
            vals = rng.normal(size=kind.shape)
            u[(l, a)] = np.where(kind == oracle.FLUID, vals, 0.0)
    vel_idx, _ = oracle.index_pyramid(case["vk"])
    oi = oracle.OracleInterpolator(case["labels"], u, vel_idx)
    ju = {k: jnp.asarray(v) for k, v in u.items()}
    node_vals, node_labels = jax.jit(interpolator.build_node_velocities)(
        case["jlabels"], ju, case["jvk"]
    )
    return case, u, ju, oi, node_vals, node_labels


def test_node_values_match_oracle(icase):
    case, u, ju, oi, node_vals, node_labels = icase
    for level in range(case["levels"]):
        got_lab = np.asarray(node_labels[level])
        want_lab = oi.node_label[level]
        np.testing.assert_array_equal(got_lab, want_lab, err_msg=f"labels level {level}")
        act = want_lab == oracle.ACTIVE_NODE
        if level == 0:
            assert act.any()
        for f in range(3):
            got = np.asarray(node_vals[level][f])
            want = oi.node_vals[level][f]
            np.testing.assert_allclose(
                got[act], want[act], rtol=1e-9, atol=1e-12,
                err_msg=f"values level {level} axis {f}",
            )


def test_interp_at_random_points_matches_oracle(icase):
    """interp_at (the arbitrary-position interpSPGrid analog) must agree with
    the oracle at random positions, across all topology fixtures."""
    case, u, ju, oi, node_vals, node_labels = icase
    levels = case["levels"]
    labels = case["labels"]
    n = case["n"]

    # positions must lie in columns that own an ACTIVE cell at some level
    covered = np.zeros(labels[0].shape, bool)
    for l in range(levels):
        act = labels[l] == oracle.ACTIVE
        for d in range(3):
            act = np.repeat(act, 1 << l, axis=d)
        covered |= act[:n, :n, :n]
    cells = np.argwhere(covered)
    assert len(cells)

    rng = np.random.default_rng(11)
    N = 400
    sel = cells[rng.integers(0, len(cells), N)]
    # keep away from cell-boundary ties where floor() choices are arbitrary
    pts = sel + rng.uniform(0.02, 0.98, size=(N, 3))

    interp_fn = jax.jit(interpolator.interp_at, static_argnums=(5,))
    for axis in range(3):
        got = np.asarray(
            interp_fn(case["jlabels"], ju, case["jvk"], node_vals,
                      jnp.asarray(pts), axis)
        )
        for i in range(N):
            want = oi.interp(pts[i], axis)
            assert got[i] == pytest.approx(want, rel=1e-9, abs=1e-12), (
                axis, i, pts[i],
            )


def test_interp_at_coarsened_faces_matches_oracle(icase):
    case, u, ju, oi, node_vals, node_labels = icase
    levels = case["levels"]
    if levels == 1:
        pytest.skip("uniform fixture has no coarsened faces")
    interp_fn = jax.jit(interpolator.interpolate_level0_faces, static_argnums=(4,))
    checked = 0
    for axis in range(3):
        got = np.asarray(
            interp_fn(case["jlabels"], ju, case["jvk"], node_vals, axis)
        )
        okind = case["vk"][0][axis]
        # the consumed set: regular FLUID faces whose octree face is interior
        # coarsened (cpp:2868-2876)
        sel = okind == oracle.UNASSIGNED
        for face in zip(*np.nonzero(sel)):
            pos = [
                face[d] if d == axis else face[d] + 0.5 for d in range(3)
            ]
            want = oi.interp(pos, axis)
            assert got[face] == pytest.approx(want, rel=1e-9, abs=1e-12), (
                axis, face,
            )
            checked += 1
    assert checked > 30  # topology must actually exercise the node path
