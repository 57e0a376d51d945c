"""Compile the CG-iteration matvec for the TPU backend and report what XLA
actually produced: fusion-kernel count inside the loop body, estimated bytes
accessed, and the largest-traffic ops.

    python tools/analyze_matvec_hlo.py [n] [impl]

impl: v1 | v1-fused
"""

import collections
import re
import sys

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, operator, stencils,
    )
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    impl = sys.argv[2] if len(sys.argv) > 2 else "v1-fused"
    config = SolverConfig(octree_levels=4, apply_impl=impl)
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

    terms_builder = None
    if impl.endswith("-fused"):
        def terms_builder():
            return stencils.build_edge_stress_blocks(
                labels, vk, ek, ew, state.viscosity, state.solid_velocity, dt, dx,
                config, with_weights=False,
            ) + stencils.build_center_stress_blocks(
                labels, vk, ck, cw, state.viscosity, state.solid_velocity, dt, dx,
                config, with_weights=False,
            )

    apply_A, diag = operator.make_operator(blocks, mass, active, rpl,
                                           terms_builder=terms_builder)

    def rep(u, blocks, mass):
        def body(c, _):
            v = apply_A(c)
            return {k: 0.01 * x for k, x in v.items()}, None
        v, _ = lax.scan(body, u, None, length=10)
        return v

    lowered = jax.jit(rep).lower(u0, blocks, mass)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("== cost_analysis (whole program, 10 applies) ==")
    for key in sorted(ca):
        if key in ("flops", "bytes accessed", "transcendentals", "optimal_seconds"):
            print(f"  {key:24s}: {ca[key]:.3e}")
    ba = ca.get("bytes accessed", 0.0)
    print(f"  bytes/apply            : {ba / 10 / 1e6:.1f} MB")

    text = compiled.as_text()
    # count ops inside the while body (the scan loop)
    ops = collections.Counter()
    bodies = re.findall(r"%?while_body[^\s{]*", text)
    in_body = False
    fusion_count = 0
    for line in text.splitlines():
        if re.match(r"\s*%?(wide_param|while_body|body)", line) and "{" in line:
            in_body = True
        if in_body:
            m = re.match(r"\s*(?:ROOT\s+)?%?\S+\s*=\s*\S+\s+(\w+)\(", line)
            if m:
                ops[m.group(1)] += 1
            if line.strip() == "}":
                in_body = False
    print("== op histogram (loop bodies) ==")
    for op, c in ops.most_common(20):
        print(f"  {op:28s}: {c}")
    print(f"total HLO text lines: {len(text.splitlines())}")
    mem = compiled.memory_analysis()
    try:
        print("temp allocation:", mem.temp_size_in_bytes / 1e6, "MB")
        print("argument size  :", mem.argument_size_in_bytes / 1e6, "MB")
    except Exception:
        pass


if __name__ == "__main__":
    main()
