"""Per-stage device timing of the viscosity pipeline (run on the TPU).

Decomposes the per-frame solve the same way the reference's perf-monitor
events do (SURVEY.md §5 / BASELINE.md), each stage as its own jit:

    python tools/profile_stages.py [n]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force real round-trip
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, interpolator, octree, operator, restriction,
        scenes, stencils,
    )
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    config = SolverConfig(octree_levels=4, tolerance=1e-4)
    state = scenes.buckling(n=n)
    dx = state.dx
    extrap = config.extrapolation * dx
    levels = capped_levels(state.liquid_sdf.shape, config.octree_levels)
    dt = jnp.float32(1 / 24.0)

    @jax.jit
    def stage_weights(st):
        cw, ew = fields.integration_weights(st.liquid_sdf, st.solid_sdf, 3, extrap, False)
        fw = fields.face_weights(st.liquid_sdf, st.solid_sdf, 3, extrap, False)
        return cw, ew, fw

    ms, (cw, ew, fw) = timed(stage_weights, state)
    print(f"weights                : {ms:8.2f} ms")

    @jax.jit
    def stage_octree(st):
        mask = octree.build_refinement_mask(st.liquid_sdf, st.solid_sdf, dx, extrap,
                                            3 * dx, 2 * dx)
        return octree.build_octree(mask, levels)

    ms, labels = timed(stage_octree, state)
    print(f"octree build           : {ms:8.2f} ms")

    @jax.jit
    def stage_classify(labels, cw, ew, st):
        vk = classify.classify_octree_velocity(labels, cw, ew, st.solid_sdf, extrap)
        ek = classify.classify_edge_stress(labels, ew)
        ck = classify.classify_center_stress(labels, cw)
        return vk, ek, ck

    ms, (vk, ek, ck) = timed(stage_classify, labels, cw, ew, state)
    print(f"classify               : {ms:8.2f} ms")

    @jax.jit
    def stage_stencils(labels, vk, ek, ck, cw, ew, fw, st):
        blocks = stencils.build_edge_stress_blocks(
            labels, vk, ek, ew, st.viscosity, st.solid_velocity, dt, dx, config
        ) + stencils.build_center_stress_blocks(
            labels, vk, ck, cw, st.viscosity, st.solid_velocity, dt, dx, config
        )
        mass = stencils.build_mass(labels, vk, fw, st.density)
        return blocks, mass

    ms, (blocks, mass) = timed(stage_stencils, labels, vk, ek, ck, cw, ew, fw, state)
    print(f"stencils + mass        : {ms:8.2f} ms")

    rpl = [tuple(l.shape) for l in labels]
    active = {(l, a): vk[l][a] == classify.FLUID for l in range(levels) for a in range(3)}

    @jax.jit
    def stage_setup(blocks, mass, st):
        guess = restriction.restrict_velocity_pyramid(list(st.velocity), levels)
        guess = {k: jnp.where(active[k], guess[k], 0.0) for k in mass}
        apply_A, diag = operator.make_operator(blocks, mass, active, rpl)
        rhs = operator.boundary_rhs(blocks, mass, guess, active, rpl)
        return guess, diag, rhs

    ms, (guess, diag, rhs) = timed(stage_setup, blocks, mass, state)
    print(f"restrict + rhs + diag  : {ms:8.2f} ms")

    def apply_once(blocks, u):
        apply_A, _ = operator.make_operator(blocks, mass, active, rpl)
        return apply_A(u)

    apply_j = jax.jit(apply_once)
    ms, _ = timed(apply_j, blocks, guess, repeats=5)
    print(f"apply_A (1 matvec)     : {ms:8.2f} ms")

    @jax.jit
    def stage_cg(blocks, rhs, guess, diag):
        apply_A, _ = operator.make_operator(blocks, mass, active, rpl)
        return operator.pcg(apply_A, rhs, guess, diag, config.tolerance,
                            config.max_iterations)

    ms, (sol, iters, res) = timed(stage_cg, blocks, rhs, guess, diag)
    print(f"CG solve ({int(iters):4d} iters) : {ms:8.2f} ms   "
          f"({ms / max(int(iters), 1):.3f} ms/iter)")

    @jax.jit
    def stage_interp(labels, sol, vk):
        return interpolator.interpolate_writeback_fields(labels, sol, vk, levels)

    ms, _ = timed(stage_interp, labels, sol, vk)
    print(f"interp + writeback     : {ms:8.2f} ms")


if __name__ == "__main__":
    main()
