"""Dissect the CG matvec cost on device: D vs D^T, level-0 vs coarse,
fused vs materialized coefficients.  Times K applications inside one jit
(scan) so per-call tunnel overhead is amortized.

    python tools/profile_matvec.py [n] [K]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed_scan(fn, u, K, label, *data):
    """fn(u, *data); ``data`` pytrees are passed as jit arguments so big
    coefficient arrays don't get baked into the HLO as literals."""
    @jax.jit
    def rep(u, *data):
        def body(c, _):
            v = fn(c, *data)
            # keep magnitudes bounded so repeated application stays finite
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
        classify, fields, octree, operator, stencils,
    )
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
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

    def apply_with(u, blocks, mass):
        f, _ = operator.make_operator(blocks, mass, active, rpl)
        return f(u)

    apply_mat, diag = operator.make_operator(blocks, mass, active, rpl)

    def terms_builder():
        return stencils.build_edge_stress_blocks(
            labels, vk, ek, ew, state.viscosity, state.solid_velocity, dt, dx,
            config, with_weights=False,
        ) + stencils.build_center_stress_blocks(
            labels, vk, ck, cw, state.viscosity, state.solid_velocity, dt, dx,
            config, with_weights=False,
        )

    apply_fused, _ = operator.make_operator(blocks, mass, active, rpl,
                                            terms_builder=terms_builder)

    lvl0 = [b for b in blocks if b.level == 0]
    coarse = [b for b in blocks if b.level > 0]
    apply_l0, _ = operator.make_operator(lvl0, mass, active, rpl)
    apply_coarse, _ = operator.make_operator(coarse, mass, active, rpl)

    def dt_only_impl(u, blocks):
        taus = [b.weight for b in blocks]  # fixed tau = weights
        return operator.apply_DT(blocks, taus, u, rpl)

    def vec_ops_impl(u, diag):
        z = {k: 1.0 / diag[k] * u[k] for k in u}
        a = operator.tree_dot(u, z)
        return operator.tree_axpy(a * 1e-20 + 0.01, z, u)

    timed_scan(apply_with, u0, K, "apply_A materialized", blocks, mass)
    timed_scan(lambda u, m: apply_fused(u), u0, K, "apply_A fused coeffs", mass)
    timed_scan(apply_with, u0, K, "apply_A level-0 blocks only", lvl0, mass)
    timed_scan(apply_with, u0, K, "apply_A coarse blocks only", coarse, mass)
    timed_scan(lambda u, b: dt_only_impl(u, b), u0, K, "D^T only (tau=weights)", blocks)
    timed_scan(lambda u, d: vec_ops_impl(u, d), u0, K, "CG vector ops (dot+axpy)", diag)


if __name__ == "__main__":
    main()
