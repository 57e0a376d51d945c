"""On-device equality artifact: fused Pallas matvec vs the v1 whole-array
operator, plus one end-to-end solve cross-check, on the live chip.

    python tools/device_check.py [n]

Prints ONE JSON line; bench.py runs this and embeds the result in its
output so "verified on device" is a recorded artifact, not a commit
message.  (The same equalities are property-tested in interpret mode on
CPU by tests/test_pallas_apply.py; this proves the compiled Mosaic
kernels on real hardware.)
"""

import json
import sys

import jax
import jax.numpy as jnp


def run(n=48):
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, operator, scenes, stencils,
    )
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels
    from adaptiveviscositysolver_tpu.ops import pallas_apply
    from adaptiveviscositysolver_tpu.solver import solve_viscosity

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
        frame, canons = pallas_apply.build_frame_data(
            labels, vk, ek, ck, blocks, mass, [tuple(l.shape) for l in labels],
        )
        return labels, vk, blocks, mass, frame

    labels, vk, blocks, mass, frame = build(state)
    rpl = [tuple(l.shape) for l in labels]
    canons = [pallas_apply.make_canon(r) for r in rpl]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}

    # random-ish deterministic test vector supported on the active faces
    key = jax.random.PRNGKey(7)
    u0 = {}
    for k in mass:
        key, sub = jax.random.split(key)
        u0[k] = jnp.where(active[k],
                          jax.random.normal(sub, mass[k].shape, jnp.float32),
                          0.0)

    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True,
    )

    got = jax.jit(lambda u, f: crop_tree(apply_pl(embed_tree(u))))(u0, frame)

    @jax.jit
    def one_v1(u, blocks, mass):
        apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)
        return apply_v1(u)

    want = one_v1(u0, blocks, mass)
    matvec_rel = max(
        float(jnp.max(jnp.abs(got[k] - want[k]))) /
        max(float(jnp.max(jnp.abs(want[k]))), 1e-30)
        for k in mass
    )

    # end-to-end: pallas CG solve vs v1-fused CG solve, same tolerance
    cfgp = SolverConfig(octree_levels=3, tolerance=1e-5, max_iterations=400,
                        apply_impl="pallas")
    cfgv = SolverConfig(octree_levels=3, tolerance=1e-5, max_iterations=400,
                        apply_impl="v1-fused")
    sp = jax.jit(lambda s, t: solve_viscosity(s, t, cfgp))(state, dt)
    sv = jax.jit(lambda s, t: solve_viscosity(s, t, cfgv))(state, dt)
    scale = max(float(jnp.max(jnp.abs(sv.velocity[a]))) for a in range(3))
    solve_rel = max(
        float(jnp.max(jnp.abs(sp.velocity[a] - sv.velocity[a]))) / scale
        for a in range(3)
    )
    return {
        "backend": jax.default_backend(),
        "n": n,
        "matvec_max_rel_err_pallas_vs_v1": matvec_rel,
        "solve_max_rel_diff_pallas_vs_v1": solve_rel,
        "pallas_iterations": int(sp.stats.iterations),
        "v1_iterations": int(sv.stats.iterations),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    print(json.dumps(run(n)))
