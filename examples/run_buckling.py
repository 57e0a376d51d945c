"""Run the coiling/buckling demo scene for a few frames on the device and
export the per-frame adaptive octree as PLY point clouds.

    python examples/run_buckling.py [frames] [n]

Artifacts land in ./out_buckling/: frame_XXX.ply (ACTIVE cell centers with
pscale + octree_level attributes — the analog of the reference's
outputOctreeGeometry debug geometry) and a stats line per frame.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from adaptiveviscositysolver_tpu import native, octree, scenes
    from adaptiveviscositysolver_tpu.config import SolverConfig, capped_levels
    from adaptiveviscositysolver_tpu.models import flip

    outdir = "out_buckling"
    os.makedirs(outdir, exist_ok=True)

    config = SolverConfig(octree_levels=4, tolerance=1e-4)
    state = scenes.buckling(n=n)
    dt = 1.0 / 48.0
    levels = capped_levels(state.liquid_sdf.shape, config.octree_levels)

    labels_fn = jax.jit(lambda sdf, solid: octree.build_octree(
        octree.build_refinement_mask(
            sdf, solid, state.dx, config.extrapolation * state.dx,
            3 * state.dx, 2 * state.dx),
        levels,
    ))

    def on_frame(i, st, stats):
        labels = [np.asarray(l) for l in labels_fn(st.liquid_sdf, st.solid_sdf)]
        path = os.path.join(outdir, f"frame_{i:03d}.ply")
        pts = native.export_octree_ply(labels, st.dx, path)
        print(
            f"frame {i:3d}: iters={int(stats.iterations):4d} "
            f"residual={float(stats.residual):.2e} "
            f"octree_dofs={int(stats.octree_dofs)} "
            f"active_cells={[int(c) for c in np.asarray(stats.active_cells)]} "
            f"ply={pts}pts -> {path}",
            flush=True,
        )

    t0 = time.perf_counter()
    state, stats = flip.simulate(state, frames, dt, config, on_frame=on_frame)
    print(f"total: {frames} frames in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
