"""Amortized timing of the Pallas applies (fused single-kernel and split
tau/D^T pair) vs the v1 XLA apply on device.

    python tools/profile_pallas.py [n] [K] [force_tx]

Timing is forced through a device-side SCALAR reduction of the scan result:
fetching a bulk array through the device tunnel runs at ~65 MB/s and a
forced round trip costs ~35 ms, which at K=100 inflated every historical
ms/apply figure by ~1.3 ms.  The remaining fixed cost is one scalar RTT
(~35 ms / K).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(label, fn, reps=3):
    out = fn()
    float(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, operator, stencils,
    )
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels
    from adaptiveviscositysolver_tpu.ops import pallas_apply

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    force_tx = int(sys.argv[3]) if len(sys.argv) > 3 else None
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
            labels, vk, ek, ck, blocks, mass,
            [tuple(l.shape) for l in labels], force_tx,
        )
        return labels, vk, blocks, mass, frame

    labels, vk, blocks, mass, frame = build(state)
    rpl = [tuple(l.shape) for l in labels]
    canons = [pallas_apply.make_canon(r, force_tx) for r in rpl]
    active = {(l, a): vk[l][a] == classify.FLUID for l in range(levels) for a in range(3)}
    u0 = {k: jnp.where(active[k], 1.0, 0.0).astype(jnp.float32) for k in mass}

    apply_fused, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True,
    )
    apply_split, _, _ = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=False,
    )
    u0c = jax.jit(embed_tree)(u0)

    def make_rep(apply_pl):
        @jax.jit
        def rep_pl(u, frame):
            def body(c, _):
                v = apply_pl(c)
                return {k: 0.01 * x for k, x in v.items()}, None
            v, _ = lax.scan(body, u, None, length=K)
            # scalar output: the scan body still runs in full (loop-carried
            # deps), but timing forces only a 4-byte fetch
            return jnp.sum(v[(0, 0)])
        return rep_pl

    rep_fused, rep_split = make_rep(apply_fused), make_rep(apply_split)
    t = timed("pallas-fused", lambda: rep_fused(u0c, frame))
    print(f"pallas fused apply       : {t / K * 1e3:8.3f} ms/apply", flush=True)
    t = timed("pallas-split", lambda: rep_split(u0c, frame))
    print(f"pallas split apply       : {t / K * 1e3:8.3f} ms/apply", flush=True)
    apply_pl = apply_fused

    # v1 comparison: build the operator INSIDE jit from traced args —
    # closing over on-device blocks bakes ~100s of MB of constants into the
    # HLO proto, which overflows the remote-compile tunnel (HTTP 413).
    @jax.jit
    def rep_v1(u, blocks, mass):
        apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)
        def body(c, _):
            v = apply_v1(c)
            return {k: 0.01 * x for k, x in v.items()}, None
        v, _ = lax.scan(body, u, None, length=K)
        return jnp.sum(v[(0, 0)])

    @jax.jit
    def one_v1(u, blocks, mass):
        apply_v1, _ = operator.make_operator(blocks, mass, active, rpl)
        return apply_v1(u)

    got = jax.jit(lambda u, f: crop_tree(apply_pl(embed_tree(u))))(u0, frame)
    want = one_v1(u0, blocks, mass)
    err = max(
        float(jnp.max(jnp.abs(got[k] - want[k]))) /
        max(float(jnp.max(jnp.abs(want[k]))), 1e-30)
        for k in mass
    )
    print(f"max rel err pallas vs v1 : {err:.3e}", flush=True)

    t = timed("v1", lambda: rep_v1(u0, blocks, mass))
    print(f"v1 apply                 : {t / K * 1e3:8.3f} ms/apply", flush=True)


if __name__ == "__main__":
    main()
