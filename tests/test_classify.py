"""Integration weights + DOF classification vs the per-cell oracle."""

import numpy as np
import pytest

import functools

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import classify, fields, octree
from tests.oracle import reference_oracle as oracle


def make_scene(n=16, levels=3, with_solid=True):
    """Liquid sphere resting on a solid floor inside an n^3 box."""
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    liquid = np.sqrt((X - 0.5) ** 2 + (Y - 0.55) ** 2 + (Z - 0.5) ** 2) - 0.28
    if with_solid:
        solid = Y - 0.3  # floor below y=0.3 (negative inside solid)
        liquid = np.minimum(liquid, Y - 0.35)  # pool below y=0.35 over the floor
    else:
        solid = np.full_like(liquid, 1e3)
    extrapolation = 0.5 * dx
    mask = octree.build_refinement_mask(
        jnp.asarray(liquid), jnp.asarray(solid), dx,
        extrapolation=extrapolation, outer_band=3 * dx, inner_band=2 * dx,
    )
    labels = jax.jit(functools.partial(octree.build_octree, levels=levels))(mask)
    return dict(
        liquid=liquid, solid=solid, dx=dx, extrapolation=extrapolation,
        labels=[np.asarray(l) for l in labels], jlabels=labels,
    )


@pytest.fixture(scope="module")
def scene():
    return make_scene()


@pytest.fixture(scope="module")
def weights(scene):
    fn = jax.jit(functools.partial(fields.integration_weights, num_samples=3,
                                   extrapolation=scene["extrapolation"],
                                   apply_solid_weights=False))
    cw, ew = fn(jnp.asarray(scene["liquid"]), jnp.asarray(scene["solid"]))
    return np.asarray(cw), [np.asarray(e) for e in ew]


def test_weights_match_oracle(scene, weights):
    cw, ew = weights
    ocw, oew = oracle.integration_weights(
        scene["liquid"], scene["solid"], 3, scene["extrapolation"], False
    )
    np.testing.assert_allclose(cw, ocw, atol=1e-6)
    for a in range(3):
        np.testing.assert_allclose(ew[a], oew[a], atol=1e-6)
    assert cw.max() == 1.0 and cw.min() == 0.0  # both saturation values occur


def test_solid_weights_match_oracle(scene):
    fn = jax.jit(functools.partial(fields.integration_weights, num_samples=2,
                                   extrapolation=scene["extrapolation"],
                                   apply_solid_weights=True))
    cw, ew = fn(jnp.asarray(scene["liquid"]), jnp.asarray(scene["solid"]))
    ocw, oew = oracle.integration_weights(
        scene["liquid"], scene["solid"], 2, scene["extrapolation"], True
    )
    np.testing.assert_allclose(np.asarray(cw), ocw, atol=1e-6)
    for a in range(3):
        np.testing.assert_allclose(np.asarray(ew[a]), oew[a], atol=1e-6)


def test_regular_velocity_classification(scene, weights):
    cw, ew = weights
    for axis in range(3):
        got = np.asarray(jax.jit(functools.partial(
            classify.classify_regular_velocity,
            extrapolation=scene["extrapolation"], axis=axis))(
            jnp.asarray(cw), [jnp.asarray(e) for e in ew], jnp.asarray(scene["solid"])))
        want = oracle.classify_regular_velocity(
            cw, ew, scene["solid"], scene["extrapolation"], axis
        )
        np.testing.assert_array_equal(got, want, err_msg=f"axis {axis}")
        assert (want == oracle.FLUID).any()
        assert (want == oracle.SOLIDBOUNDARY).any()


def test_octree_velocity_classification(scene, weights):
    cw, ew = weights
    got = jax.jit(functools.partial(classify.classify_octree_velocity,
                                    extrapolation=scene["extrapolation"]))(
        scene["jlabels"], jnp.asarray(cw), [jnp.asarray(e) for e in ew],
        jnp.asarray(scene["solid"]))
    want = oracle.classify_octree_velocity(
        scene["labels"], cw, ew, scene["solid"], scene["extrapolation"]
    )
    for level in range(len(want)):
        for axis in range(3):
            np.testing.assert_array_equal(
                np.asarray(got[level][axis]), want[level][axis],
                err_msg=f"level {level} axis {axis}",
            )
    # coarse levels must carry some fluid DOFs in this scene
    assert any((want[l][a] == oracle.FLUID).any() for l in range(1, len(want)) for a in range(3))


def test_edge_stress_classification(scene, weights):
    cw, ew = weights
    got = jax.jit(classify.classify_edge_stress)(scene["jlabels"], [jnp.asarray(e) for e in ew])
    want = oracle.classify_edge_stress(scene["labels"], ew)
    for level in range(len(want)):
        for axis in range(3):
            np.testing.assert_array_equal(
                np.asarray(got[level][axis]), want[level][axis],
                err_msg=f"level {level} axis {axis}",
            )


def test_center_stress_classification(scene, weights):
    cw, _ = weights
    got = jax.jit(classify.classify_center_stress)(scene["jlabels"], jnp.asarray(cw))
    want = oracle.classify_center_stress(scene["labels"], cw)
    for level in range(len(want)):
        np.testing.assert_array_equal(np.asarray(got[level]), want[level])


def test_assign_indices():
    kinds = [
        jnp.asarray(np.array([[[0, -1], [0, -3]], [[0, -2], [-1, 0]]], np.int8)),
        jnp.asarray(np.array([[[0, 0]]], np.int8)),
    ]
    grids, total = classify.assign_indices(kinds)
    assert int(total) == 6
    flat0 = np.asarray(grids[0]).reshape(-1)
    assert list(flat0) == [0, -1, 1, -3, 2, -2, -1, 3]
    assert list(np.asarray(grids[1]).reshape(-1)) == [4, 5]


def test_dof_layout_invariants(scene, weights):
    """The reference's three debug DOF unit tests (cpp:2896-3298) hold for
    our classification."""
    cw, ew = weights
    vel_idx, _ = oracle.index_pyramid(
        oracle.classify_octree_velocity(
            scene["labels"], cw, ew, scene["solid"], scene["extrapolation"])
    )
    edge_idx, _ = oracle.index_pyramid(
        oracle.classify_edge_stress(scene["labels"], ew)
    )
    center_idx, _ = oracle.assign_indices(
        oracle.classify_center_stress(scene["labels"], cw)
    )
    fails = oracle.check_dof_invariants(
        scene["labels"], vel_idx, edge_idx, center_idx
    )
    assert not fails, fails[:5]
