"""Attribute the fused apply's cross-level XLA glue cost.

    python tools/profile_glue.py [n] [K]

profile_levels.py showed the four per-level kernels cost ~1.2 ms while the
full apply costs ~2.1 ms at 96^3 — ~0.9 ms of cross-level XLA work.  This
tool splits that into (a) extras construction (crop -> upread/child-sum ->
embed for the up/cs kernel inputs) and (b) adjoint application (crop ->
upread_adjoint/child_sum_adjoint -> embed -> masked add for zp/zc), by
timing applies with each half replaced by static zeros / skipped.
"""

import sys
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from adaptiveviscositysolver_tpu import (
        classify, fields, octree, stencils,
    )
    from adaptiveviscositysolver_tpu import scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels
    from adaptiveviscositysolver_tpu.ops import pallas_apply
    from adaptiveviscositysolver_tpu.ops.arrayops import (
        face_child_sum, face_child_sum_adjoint, face_shape, upread,
        upread_adjoint,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 200
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
    active_c = {
        (l, f): pallas_apply.embed(active[(l, f)], canons[l], False)
        for l in range(levels) for f in range(3)
    }

    def fshape(l, f):
        return face_shape(rpl[l], f)

    def kernels_only(u, frm, with_extras, with_adjoints):
        extras: Dict[str, jnp.ndarray] = {}
        if with_extras:
            for l in range(levels):
                if l + 1 < levels:
                    for f in range(3):
                        cu = pallas_apply.crop(u[(l + 1, f)], canons[l + 1], fshape(l + 1, f))
                        extras[f"up{f}_{l}"] = pallas_apply.embed(
                            upread(cu, fshape(l, f)), canons[l], 0.0)
                if l > 0:
                    for f in range(3):
                        fu = pallas_apply.crop(u[(l - 1, f)], canons[l - 1], fshape(l - 1, f))
                        extras[f"cs{f}_{l}"] = pallas_apply.embed(
                            face_child_sum(fu, f, fshape(l, f)), canons[l], 0.0)

        outs: Dict[Tuple[int, int], jnp.ndarray] = {}
        zps, zcs = {}, {}
        for l in range(levels):
            kc = canons[l]
            f_call, fin, fout = pallas_apply._compiled_fused_call(
                l, levels, kc, dx, True, False)

            def arg_for(name):
                if name.startswith("u") and not name.startswith("up"):
                    return u[(l, int(name[1]))]
                if name.startswith("up") or name.startswith("cs"):
                    if with_extras:
                        return extras[f"{name}_{l}"]
                    return jnp.zeros(kc.shape, jnp.float32)
                return frm[f"{name}_{l}"]

            res = f_call(*[arg_for(nm) for nm, _, _ in fin])
            for name, r in zip(fout, res):
                if name.startswith("out"):
                    outs[(l, int(name[3]))] = r
                elif name.startswith("zp"):
                    zps[(l, int(name[2]))] = r
                else:
                    zcs[(l, int(name[2]))] = r

        if with_adjoints:
            for (l, f), zp in zps.items():
                zl = pallas_apply.crop(zp, canons[l], fshape(l, f))
                up_adj = upread_adjoint(zl, fshape(l + 1, f))
                outs[(l + 1, f)] = outs[(l + 1, f)] + jnp.where(
                    active_c[(l + 1, f)],
                    pallas_apply.embed(up_adj, canons[l + 1], 0.0), 0.0)
            for (l, f), zc in zcs.items():
                zl = pallas_apply.crop(zc, canons[l], fshape(l, f))
                cs_adj = face_child_sum_adjoint(zl, f, fshape(l - 1, f))
                outs[(l - 1, f)] = outs[(l - 1, f)] + jnp.where(
                    active_c[(l - 1, f)],
                    pallas_apply.embed(cs_adj, canons[l - 1], 0.0), 0.0)
        return outs

    apply_full, embed_tree, _ = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True)
    u0c = jax.jit(embed_tree)(u0)

    def scan_of(fn):
        @jax.jit
        def rep(u, frm):
            def body(c, _):
                v = fn(c, frm)
                return {k: 0.01 * v[k] if k in v else c[k] for k in c}, None
            v, _ = lax.scan(body, u, None, length=K)
            return jnp.sum(v[(0, 0)])
        return rep

    variants = [
        ("full apply", scan_of(lambda u, f: apply_full(u))),
        ("kernels only", scan_of(lambda u, f: kernels_only(u, f, False, False))),
        ("kernels + extras", scan_of(lambda u, f: kernels_only(u, f, True, False))),
        ("kernels + adjoints", scan_of(lambda u, f: kernels_only(u, f, False, True))),
        ("scan floor", scan_of(lambda u, f: dict(u))),
    ]

    for name, fn in variants:
        t0 = time.perf_counter()
        out = fn(u0c, frame)
        float(jax.tree_util.tree_leaves(out)[0])
        print(f"compiled {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {name: float("inf") for name, _ in variants}
    for _ in range(3):
        for name, fn in variants:
            t0 = time.perf_counter()
            out = fn(u0c, frame)
            float(jax.tree_util.tree_leaves(out)[0])
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, _ in variants:
        print(f"{name:22s}: {best[name] / K * 1e3:8.3f} ms/apply", flush=True)


if __name__ == "__main__":
    main()
