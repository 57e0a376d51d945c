"""Decompose the fused Pallas apply: per-level kernel cost vs cross-level
XLA glue, plus a pure-DMA traffic floor for the level-0 box.

    python tools/profile_levels.py [n] [K] [force_tx]

Interleaves the timed variants (3 rounds, best-of) so slow drifts of the
shared device don't masquerade as kernel differences.
"""

import sys
import time

import numpy as np

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
        return labels, vk, mass, frame

    labels, vk, mass, frame = build(state)
    rpl = [tuple(l.shape) for l in labels]
    canons = [pallas_apply.make_canon(r, force_tx) for r in rpl]
    active = {(l, a): vk[l][a] == classify.FLUID
              for l in range(levels) for a in range(3)}
    u0 = {k: jnp.where(active[k], 1.0, 0.0).astype(jnp.float32) for k in mass}

    apply_fused, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
        frame, canons, active, rpl, dx, enhanced=True, fused=True,
    )
    u0c = jax.jit(embed_tree)(u0)

    def scan_of(fn):
        @jax.jit
        def rep(u, frame):
            def body(c, _):
                v = fn(c, frame)
                # per-level variants update only their level's faces: keep
                # the rest of the carry so the scan pytree is stable
                nxt = {k: 0.01 * v[k] if k in v else c[k] for k in c}
                return nxt, None
            v, _ = lax.scan(body, u, None, length=K)
            # scalar output: forcing a bulk array through the tunnel costs
            # ~35 ms RTT + ~65 MB/s, which would pollute the timing
            return jnp.sum(v[(0, 0)])
        return rep

    # --- full apply
    full = scan_of(lambda u, f: apply_fused(u))

    # --- single-level kernel only (no cross-level args: top-style kernel
    # would differ; instead call the real level-l kernel with zeros for
    # cross-level inputs, reusing the SAME compiled kernel)
    def level_only(l):
        f_call, fin, fout = pallas_apply._compiled_fused_call(
            l, levels, canons[l], dx, True, False
        )

        def one(u, frame):
            args = []
            for name, dt_, h in fin:
                if name.startswith("u") and not name.startswith("up"):
                    args.append(u[(l, int(name[1]))])
                elif name.startswith("up") or name.startswith("cs"):
                    args.append(jnp.zeros(canons[l].shape, jnp.float32))
                else:
                    args.append(frame[f"{name}_{l}"])
            res = f_call(*args)
            return {(l, f): r for f, r in zip(range(3), res[:3])}
        return one

    per_level = {l: scan_of(level_only(l)) for l in range(levels)}

    # --- pure DMA floor: stream the same input bytes the level-0 kernel
    # touches (u x3 + kp x4 + we x3 + wc + m x3 f32/int8 slabs) and write 3
    # outputs; body is a trivial add, so the cost is the HBM traffic.
    c0 = canons[0]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32_in = [nm for nm, dt_, h in pallas_apply._fused_input_names(0, levels)
              if dt_ == jnp.float32]
    i8_in = [nm for nm, dt_, h in pallas_apply._fused_input_names(0, levels)
             if dt_ == jnp.int8]
    halos = {nm: h for nm, dt_, h in pallas_apply._fused_input_names(0, levels)}
    TX = c0.TX
    CX, CY, CZ = c0.shape

    def dma_kernel(*refs):
        nin = len(f32_in) + len(i8_in)
        ins = refs[:nin]
        outs = refs[nin:nin + 3]
        scratch = refs[nin + 3:nin + 3 + nin]
        sems = refs[nin + 3 + nin]
        i = pl.program_id(0)
        interior = jnp.logical_and(i >= c0.PX, i < c0.PX + c0.K)

        @pl.when(jnp.logical_not(interior))
        def _():
            for j in range(3):
                outs[j][:] = jnp.zeros((TX, CY, CZ), jnp.float32)

        @pl.when(interior)
        def _():
            names = f32_in + i8_in
            copies = [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(i * TX - halos[nm], TX + 2 * halos[nm])],
                    scratch[j], sems.at[j])
                for j, nm in enumerate(names)
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            acc = None
            for j, nm in enumerate(f32_in):
                w = scratch[j][halos[nm]:halos[nm] + TX]
                acc = w if acc is None else acc + w
            for j in range(3):
                outs[j][:] = acc

    names = f32_in + i8_in
    dma_call = pl.pallas_call(
        dma_kernel,
        grid=(c0.grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * len(names),
        out_specs=[pl.BlockSpec((TX, CY, CZ), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((CX, CY, CZ), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((TX + 2 * halos[nm], CY, CZ),
                       jnp.float32 if nm in f32_in else jnp.int8)
            for nm in names
        ] + [pltpu.SemaphoreType.DMA((len(names),))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pallas_apply.VMEM_LIMIT),
    )

    def dma_only(u, frame):
        args = []
        for nm in names:
            if nm.startswith("u") and not nm.startswith("up"):
                args.append(u[(0, int(nm[1]))])
            elif nm.startswith("up") or nm.startswith("cs"):
                args.append(jnp.zeros(c0.shape, jnp.float32))
            else:
                args.append(frame[f"{nm}_0"])
        res = dma_call(*args)
        return {(0, f): r for f, r in zip(range(3), res)}

    dma = scan_of(dma_only)

    # --- scan-loop floors: how much of every number above is fixed
    # per-iteration overhead (dispatch / carry traffic), not kernel work?
    def tiny_only(u, frame):
        k = (levels - 1, 0)
        return {k: u[k] + 1.0}

    def carry_all(u, frame):
        return dict(u)

    floor_tiny = scan_of(tiny_only)
    floor_all = scan_of(carry_all)

    variants = [("full apply", full)]
    variants += [(f"level {l} kernel only", per_level[l]) for l in range(levels)]
    variants += [("level 0 DMA floor", dma)]
    variants += [("scan floor (1 tiny op)", floor_tiny),
                 ("scan floor (carry x0.01)", floor_all)]

    # warm-up / compile
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
        print(f"{name:24s}: {best[name] / K * 1e3:8.3f} ms/apply", flush=True)


if __name__ == "__main__":
    main()
