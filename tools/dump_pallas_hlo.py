"""Dump the optimized HLO of one fused-Pallas apply and summarize the
non-custom-call ops by estimated bytes (the cross-level "glue").

    python tools/dump_pallas_hlo.py [n] [out.txt]
"""

import collections
import re
import sys

import jax
import jax.numpy as jnp


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, stencils,
    )
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels
    from adaptiveviscositysolver_tpu.ops import pallas_apply

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pallas_apply_hlo.txt"
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
        return labels, vk, mass, frame

    labels, vk, mass, frame = build(state)
    rpl = [tuple(l.shape) for l in labels]
    canons = [pallas_apply.make_canon(r) for r in rpl]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}
    u0 = {k: jnp.where(active[k], 1.0, 0.0).astype(jnp.float32) for k in mass}

    apply_fused, embed_tree, _ = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True)
    u0c = jax.jit(embed_tree)(u0)

    def one(u, frm):
        return apply_fused(u)

    lowered = jax.jit(one).lower(u0c, frame)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # crude per-op traffic summary: sum shape bytes of non-fused root ops
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
                "bf16": 2, "f64": 8}
    op_bytes = collections.Counter()
    op_count = collections.Counter()
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.-]+)\s*=\s*(\([^)]*\)|\S+)\s+(\w+)", line)
        if not m:
            continue
        op = m.group(3)
        if op in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        total = 0
        for dm in shape_re.finditer(m.group(2)):
            dims = dm.group(2)
            sz = 1
            for d in dims.split(","):
                if d:
                    sz *= int(d)
            total += sz * dt_bytes.get(dm.group(1), 4)
        key = op
        if op == "fusion":
            km = re.search(r"kind=(\w+)", line)
            key = f"fusion:{km.group(1) if km else '?'}"
        op_bytes[key] += total
        op_count[key] += 1
    print("top output-bytes by op kind:")
    for k, v in op_bytes.most_common(15):
        print(f"  {k:28s} {v/1e6:10.1f} MB  x{op_count[k]}")


if __name__ == "__main__":
    main()
