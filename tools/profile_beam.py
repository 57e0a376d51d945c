"""Per-iteration cost decomposition of the CROPPED pallas CG on the beam
scene (the small-system workload where per-iteration overheads dominate).

    python tools/profile_beam.py [n] [K]

Times, all device-side with scalar forces:
  - apply only              (scan of apply_A on canonical trees)
  - full PCG iteration      (pcg_flat with tolerance 0, fixed K iters)
and reports the implied glue/algebra split.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, operator, restriction, scenes, stencils,
    )
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels
    from adaptiveviscositysolver_tpu.ops import pallas_apply
    from adaptiveviscositysolver_tpu.solver import probe_topology

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    config = SolverConfig(octree_levels=4, tolerance=1e-4)
    state = scenes.beam(n=n)
    dx = state.dx
    extrap = config.extrapolation * dx
    levels, bboxes = probe_topology(state, config)
    print(f"levels={levels} windows={bboxes}", flush=True)
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
        guess = restriction.restrict_velocity_pyramid(list(st.velocity), levels)
        guess = {k: jnp.where(vk[k[0]][k[1]] == classify.FLUID, guess[k], 0.0)
                 for k in mass}
        _, diag = operator.make_operator(blocks, mass,
                                         {k: vk[k[0]][k[1]] == classify.FLUID
                                          for k in mass},
                                         [tuple(l.shape) for l in labels])
        rhs = operator.boundary_rhs(
            blocks, mass, guess,
            {k: vk[k[0]][k[1]] == classify.FLUID for k in mass},
            [tuple(l.shape) for l in labels])
        frame, canons = pallas_apply.build_frame_data(
            labels, vk, ek, ck, blocks, mass,
            [tuple(l.shape) for l in labels], bboxes=bboxes,
        )
        return labels, vk, mass, frame, rhs, guess, diag

    labels, vk, mass, frame, rhs, guess, diag = build(state)
    rpl = [tuple(l.shape) for l in labels]
    canons = [pallas_apply.make_canon(r, None, bboxes[l])
              for l, r in enumerate(rpl)]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}

    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True,
    )
    u0c = jax.jit(embed_tree)(guess)
    csize = sum(v.size for v in u0c.values()) * 4 / 1e6
    print(f"canonical tree: {csize:.1f} MB", flush=True)

    @jax.jit
    def rep_apply(u, frame):
        def body(c, _):
            v = apply_pl(c)
            return {k: 0.01 * x for k, x in v.items()}, None
        v, _ = lax.scan(body, u, None, length=K)
        return jnp.sum(v[(0, 0)])

    @jax.jit
    def rep_pcg(rhs, guess, diag, frame):
        sol, iters, rr = operator.pcg_flat(
            apply_pl, embed_tree(rhs), embed_tree(guess),
            embed_tree(diag, fill=1.0), 0.0, K,
        )
        return jnp.sum(sol[(0, 0)]) + iters

    variants = [
        ("apply only", lambda: rep_apply(u0c, frame)),
        ("full PCG iter", lambda: rep_pcg(rhs, guess, diag, frame)),
    ]
    for name, fn in variants:
        t0 = time.perf_counter()
        float(fn())
        print(f"compiled {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    best = {name: float("inf") for name, _ in variants}
    for _ in range(3):
        for name, fn in variants:
            t0 = time.perf_counter()
            float(fn())
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, _ in variants:
        print(f"{name:16s}: {best[name] / K * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
