"""Amortized (scan-K) timing of the v2 halo-padded apply vs v1, on device.

    python tools/profile_matvec_v2.py [n] [K]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed_scan(make_fn, u, K, label, *data):
    @jax.jit
    def rep(u, *data):
        fn = make_fn(*data)

        def body(c, _):
            v = fn(c)
            return {k: 0.01 * x for k, x in v.items()}, None

        v, _ = lax.scan(body, u, None, length=K)
        return v

    out = rep(u, *data)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = rep(u, *data)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s}: {best / K * 1e3:8.3f} ms/apply", flush=True)
    return best / K


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, operator, operator2, stencils,
    )
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    config = SolverConfig(octree_levels=4)
    state = scenes.buckling(n=n)
    dx = state.dx
    extrap = config.extrapolation * dx
    levels = capped_levels(state.liquid_sdf.shape, config.octree_levels)
    dt = jnp.float32(1 / 24.0)

    @jax.jit
    def build(st):
        cw, ew = fields.integration_weights(st.liquid_sdf, st.solid_sdf, 3, extrap, False)
        fw = fields.face_weights(st.liquid_sdf, st.solid_sdf, 3, extrap, False)
        mask = octree.build_refinement_mask(st.liquid_sdf, st.solid_sdf, dx, extrap,
                                            3 * dx, 2 * dx)
        labels = octree.build_octree(mask, levels)
        vk = classify.classify_octree_velocity(labels, cw, ew, st.solid_sdf, extrap)
        ek = classify.classify_edge_stress(labels, ew)
        ck = classify.classify_center_stress(labels, cw)
        blocks = stencils.build_edge_stress_blocks(
            labels, vk, ek, ew, st.viscosity, st.solid_velocity, dt, dx, config
        ) + stencils.build_center_stress_blocks(
            labels, vk, ck, cw, st.viscosity, st.solid_velocity, dt, dx, config
        )
        mass = stencils.build_mass(labels, vk, fw, st.density)
        return labels, vk, ek, ck, cw, ew, blocks, mass

    labels, vk, ek, ck, cw, ew, blocks, mass = build(state)
    rpl = [tuple(l.shape) for l in labels]
    active = {(l, a): vk[l][a] == classify.FLUID for l in range(levels) for a in range(3)}
    u0 = {k: jnp.where(active[k], 1.0, 0.0).astype(jnp.float32) for k in mass}

    # v1 materialized
    def mk_v1(blocks, mass):
        f, _ = operator.make_operator(blocks, mass, active, rpl)
        return f

    timed_scan(mk_v1, u0, K, "v1 materialized", blocks, mass)

    # v2 materialized
    blocks_p = jax.jit(operator2.pad_block_data)(blocks)

    def mk_v2(blocks_p, mass):
        f, pad_tree, unpad_tree = operator2.make_operator2(blocks_p, mass, active, rpl)

        def wrapped(u):
            return unpad_tree(f(pad_tree(u)))

        return wrapped

    timed_scan(mk_v2, u0, K, "v2 materialized (pad per apply)", blocks_p, mass)

    # v2 staying in padded space (the real CG layout)
    def mk_v2p(blocks_p, mass):
        f, pad_tree, unpad_tree = operator2.make_operator2(blocks_p, mass, active, rpl)
        return f

    _, pad_tree, _ = operator2.make_operator2(blocks_p, mass, active, rpl)
    u0p = jax.jit(pad_tree)(u0)
    timed_scan(mk_v2p, u0p, K, "v2 materialized (padded state)", blocks_p, mass)


if __name__ == "__main__":
    main()
