"""T-junction node interpolator vs the loop-transcribed oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify, interpolator
from tests.oracle import reference_oracle as oracle
from tests.test_operator import build_case


@pytest.fixture(scope="module", params=["adaptive", "adaptive_nosolid"])
def icase(request):
    kwargs = {} if request.param == "adaptive" else dict(with_solid=False)
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


def test_interp_at_coarsened_faces_matches_oracle(icase):
    case, u, ju, oi, node_vals, node_labels = icase
    levels = case["levels"]
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
