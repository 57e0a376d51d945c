"""On-device check + timing of the y-brick kernels.

Builds the frame at a given n, applies the operator once with the given
per-level modes, and cross-checks against the v1 whole-array apply on the
chip; then times K applies (honest fori-loop protocol).

    python tools/check_brick_device.py [n=64] [K=100] [mode=brick]

mode: "brick" (force ("brick", 32) everywhere), "auto" (level_modes).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    mode = sys.argv[3] if len(sys.argv) > 3 else "brick"

    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, operator, scenes, stencils,
    )
    from adaptiveviscositysolver_tpu.config import SolverConfig
    from adaptiveviscositysolver_tpu.ops import pallas_apply

    levels = 3
    state = scenes.buckling(n=n, dtype=jnp.float32)
    cfg = SolverConfig(octree_levels=levels)
    dx, dt = state.dx, jnp.float32(1 / 24.0)
    extrap = cfg.extrapolation * dx

    @jax.jit
    def build(st):
        cw, ew = fields.integration_weights(
            st.liquid_sdf, st.solid_sdf, 3, extrap, False)
        fw = fields.face_weights(st.liquid_sdf, st.solid_sdf, 3, extrap, False)
        mask = octree.build_refinement_mask(
            st.liquid_sdf, st.solid_sdf, dx, extrap, 3 * dx, 2 * dx)
        labels = octree.build_octree(mask, levels)
        vk = classify.classify_octree_velocity(labels, cw, ew, st.solid_sdf, extrap)
        ek = classify.classify_edge_stress(labels, ew)
        ck = classify.classify_center_stress(labels, cw)
        blocks = stencils.build_edge_stress_blocks(
            labels, vk, ek, ew, st.viscosity, st.solid_velocity, dt, dx, cfg,
        ) + stencils.build_center_stress_blocks(
            labels, vk, ck, cw, st.viscosity, st.solid_velocity, dt, dx, cfg,
        )
        mass = stencils.build_mass(labels, vk, fw, st.density)
        return labels, vk, ek, ck, blocks, mass

    labels, vk, ek, ck, blocks, mass = build(state)
    rpl = [tuple(int(d) for d in l.shape) for l in labels]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}

    if mode == "brick":
        modes = [("brick", 32)] * levels
    else:
        modes = pallas_apply.level_modes(rpl)
    print("modes:", modes)

    frame, canons = pallas_apply.build_frame_data(
        labels, vk, ek, ck, blocks, mass, rpl, modes=modes)
    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True,
        interpret=jax.default_backend() != "tpu", fused=modes)
    apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)

    rng = np.random.default_rng(3)
    u = {k: jnp.where(active[k],
                      jnp.asarray(rng.normal(size=mass[k].shape), jnp.float32),
                      0.0) for k in mass}

    want = jax.jit(apply_v1)(u)
    got = crop_tree(jax.jit(lambda w: apply_pl(embed_tree(w)))(u))
    worst = 0.0
    for k in sorted(mass):
        w, g = np.asarray(want[k]), np.asarray(got[k])
        scale = max(np.abs(w).max(), 1e-30)
        worst = max(worst, float(np.abs(g - w).max() / scale))
    print(f"max rel diff vs v1: {worst:.2e}")
    assert worst < 3e-5, worst

    uc = embed_tree(u)

    @jax.jit
    def many(uc):
        def body(_, w):
            out = apply_pl(w)
            s = 1.0 / (1.0 + sum(jnp.max(jnp.abs(o)) for o in out.values()))
            return {k: o * s for k, o in out.items()}
        return sum(jnp.sum(v) for v in jax.lax.fori_loop(0, K, body, uc).values())

    float(many(uc))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(uc))
        best = min(best, time.perf_counter() - t0)
    print(f"apply: {best / K * 1e3:.3f} ms (K={K}, n={n}, mode={mode})")


if __name__ == "__main__":
    main()
