"""Decompose the fused Pallas apply into per-level kernel cost and
cross-level glue (upread/child-sum views + adjoint scatter) cost.

    python tools/profile_decomp.py [n] [K] [scene]

All timings force a device-side scalar only (see profile_pallas.py for the
tunnel-cost rationale).  The per-level reps feed the loop carry into the
kernel's u inputs so XLA cannot hoist the call; up/cs extras are static
zeros (their DMA cost is still paid, their XLA construction cost is not —
that cost is what the glue rep measures).
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, reps=3):
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
    import dataclasses

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
    scene_name = sys.argv[3] if len(sys.argv) > 3 else "buckling"
    config = SolverConfig(octree_levels=4)
    state = getattr(scenes, scene_name)(n=n)
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
            [tuple(l.shape) for l in labels],
        )
        return labels, vk, mass, frame

    labels, vk, mass, frame = build(state)
    rpl = [tuple(l.shape) for l in labels]
    canons = [pallas_apply.make_canon(r) for r in rpl]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}
    u0 = {k: jnp.where(active[k], 1.0, 0.0).astype(jnp.float32) for k in mass}

    apply_pl, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True,
    )
    u0c = jax.jit(embed_tree)(u0)

    def fshape(l, f):
        return face_shape(rpl[l], f)

    # ---- full apply
    @jax.jit
    def rep_full(u, frame):
        def body(c, _):
            v = apply_pl(c)
            return {k: 0.01 * x for k, x in v.items()}, None
        v, _ = lax.scan(body, u, None, length=K)
        return jnp.sum(v[(0, 0)])

    t_full = timed(lambda: rep_full(u0c, frame))
    print(f"full apply        : {t_full / K * 1e3:8.3f} ms", flush=True)

    # ---- per-level kernel only
    t_levels = []
    for l in range(levels):
        kcanon = dataclasses.replace(canons[l], org=(0, 0, 0))
        f_call, fin, fout = pallas_apply._compiled_fused_call(
            l, levels, kcanon, dx, True, False)
        zero = jnp.zeros(kcanon.shape, jnp.float32)

        @jax.jit
        def rep_l(u3, frame, l=l, f_call=f_call, fin=fin, fout=fout,
                  zero=zero):
            def body(c, _):
                args = []
                for nm, _, _ in fin:
                    if nm.startswith("u") and not nm.startswith("up"):
                        args.append(c[int(nm[1])])
                    elif nm.startswith("up") or nm.startswith("cs"):
                        args.append(zero)
                    else:
                        args.append(frame[f"{nm}_{l}"])
                res = f_call(*args)
                outs = [r for nm2, r in zip(fout, res)
                        if nm2.startswith("out")]
                return tuple(0.01 * o for o in outs), None
            v, _ = lax.scan(body, u3, None, length=K)
            return jnp.sum(v[0])

        u3 = tuple(u0c[(l, f)] for f in range(3))
        t = timed(lambda rep_l=rep_l, u3=u3: rep_l(u3, frame))
        t_levels.append(t)
        print(f"level {l} kernel    : {t / K * 1e3:8.3f} ms", flush=True)

    # ---- glue only: the exact cross-level views + adjoint adds of apply_A,
    # with the kernels replaced by identity (zp/zc := u views)
    active_c = {
        (l, f): pallas_apply.embed(active[(l, f)], canons[l], False)
        for l in range(levels) for f in range(3)
    }

    def glue(u):
        outs = dict(u)
        eps = jnp.float32(1e-30)
        for l in range(levels):
            if l + 1 < levels:
                for f in range(3):
                    cu = pallas_apply.crop(u[(l + 1, f)], canons[l + 1],
                                           fshape(l + 1, f))
                    up = pallas_apply.embed(
                        upread(cu, fshape(l, f)), canons[l], 0.0)
                    outs[(l, f)] = outs[(l, f)] + eps * up
            if l > 0:
                for f in range(3):
                    fu = pallas_apply.crop(u[(l - 1, f)], canons[l - 1],
                                           fshape(l - 1, f))
                    cs = pallas_apply.embed(
                        face_child_sum(fu, f, fshape(l, f)), canons[l], 0.0)
                    outs[(l, f)] = outs[(l, f)] + eps * cs
        for l in range(levels - 1):
            for f in range(3):
                zl = pallas_apply.crop(u[(l, f)], canons[l], fshape(l, f))
                up_adj = upread_adjoint(zl, fshape(l + 1, f))
                outs[(l + 1, f)] = outs[(l + 1, f)] + jnp.where(
                    active_c[(l + 1, f)],
                    pallas_apply.embed(up_adj, canons[l + 1], 0.0), 0.0)
        for l in range(1, levels):
            for f in range(3):
                zl = pallas_apply.crop(u[(l, f)], canons[l], fshape(l, f))
                cs_adj = face_child_sum_adjoint(zl, f, fshape(l - 1, f))
                outs[(l - 1, f)] = outs[(l - 1, f)] + jnp.where(
                    active_c[(l - 1, f)],
                    pallas_apply.embed(cs_adj, canons[l - 1], 0.0), 0.0)
        return outs

    @jax.jit
    def rep_glue(u):
        def body(c, _):
            v = glue(c)
            return {k: 0.01 * x for k, x in v.items()}, None
        v, _ = lax.scan(body, u, None, length=K)
        return jnp.sum(v[(0, 0)])

    t_glue = timed(lambda: rep_glue(u0c))
    print(f"glue only         : {t_glue / K * 1e3:8.3f} ms", flush=True)
    t_sum = sum(t_levels) + t_glue
    print(f"sum of parts      : {t_sum / K * 1e3:8.3f} ms "
          f"(full - sum = {(t_full - t_sum) / K * 1e3:+.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
