"""Octree build: oracle agreement + the reference's debug invariants (C6)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptiveviscositysolver_tpu import octree
from tests.oracle import reference_oracle as oracle


@functools.lru_cache(maxsize=None)
def _jit_build(levels):
    return jax.jit(functools.partial(octree.build_octree, levels=levels))


def build(mask, levels):
    return _jit_build(levels)(jnp.asarray(mask))


def sphere_mask(n, levels, center=None, radius=None, band=2.0):
    """Ternary refinement mask around a sphere surface (beam-like band)."""
    if center is None:
        center = (n / 2.0,) * 3
    if radius is None:
        radius = n / 4.0
    x = np.arange(n) + 0.5
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sdf = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2 + (Z - center[2]) ** 2) - radius
    mask = np.where(sdf >= 3.0, 1, np.where(sdf <= -band, -1, 0)).astype(np.int8)
    return mask


@pytest.mark.parametrize("n,levels", [
    pytest.param(16, 3, marks=pytest.mark.smoke), (32, 4), (32, 3)])
def test_octree_matches_oracle(n, levels):
    mask = sphere_mask(n, levels)
    got = build(mask, levels)
    want = oracle.build_octree(mask, levels)
    for level, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(np.asarray(g), w, err_msg=f"level {level}")


@pytest.mark.parametrize("n,levels,band", [
    pytest.param(16, 3, 2.0, marks=pytest.mark.smoke),
    (32, 4, 2.0), (32, 4, 4.0)])
def test_octree_invariants(n, levels, band):
    mask = sphere_mask(n, levels, band=band)
    labels = [np.asarray(l) for l in build(mask, levels)]
    fails = oracle.check_octree_invariants(labels)
    assert not fails, fails[:5]


def test_octree_all_active_single_level():
    mask = np.zeros((8, 8, 8), np.int8)
    labels = build(mask, 2)
    assert np.all(np.asarray(labels[0]) == octree.ACTIVE)
    assert np.all(np.asarray(labels[1]) == octree.DOWN)


def test_octree_deep_interior_coarsens():
    # entirely interior region -> everything coarsens to the top level
    mask = np.full((16, 16, 16), -1, np.int8)
    labels = build(mask, 3)
    assert np.all(np.asarray(labels[0]) == octree.UP)
    assert np.all(np.asarray(labels[1]) == octree.UP)
    assert np.all(np.asarray(labels[2]) == octree.ACTIVE)
    fails = oracle.check_octree_invariants([np.asarray(l) for l in labels])
    assert not fails, fails[:5]


def test_refine_grid():
    mask = sphere_mask(16, 3)
    labels = build(mask, 3)
    refined = octree.refine_grid(labels)
    for lab, ref in zip(labels, refined):
        assert ref.shape == tuple(2 * s for s in lab.shape)
        np.testing.assert_array_equal(np.asarray(ref)[::2, ::2, ::2], np.asarray(lab))


def test_octree_geometry_export():
    mask = sphere_mask(16, 3)
    labels = build(mask, 3)
    pos, pscale, lev = octree.octree_geometry(labels, dx=0.1)
    n_active = sum(int((np.asarray(l) == octree.ACTIVE).sum()) for l in labels)
    assert pos.shape == (n_active, 3)
    assert set(np.unique(lev)) <= {0, 1, 2}
    assert np.all(pscale[lev == 1] == pytest.approx(0.2))
