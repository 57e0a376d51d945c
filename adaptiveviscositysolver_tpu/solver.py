"""Top-level per-frame adaptive viscosity solve — one jitted pipeline.

The TPU-native equivalent of HDK_AdaptiveViscosity::solveGasSubclass
(/root/reference/Source/HDK_AdaptiveViscosity.cpp:126-710): given the liquid
SDF, solid SDF, staggered velocity, solid velocity, viscosity and density
fields, rebuild the octree, classify DOFs, build the variational stress
stencils, solve the SPD system with Jacobi-preconditioned CG, and write the
solution back to the uniform grid.

Everything below runs as a single ``jax.jit`` program with static shapes:
the octree topology lives in dense mask/coefficient arrays, so a topology
change never triggers recompilation.

Stage names mirror the reference's perf-monitor events (cpp:306-880) via
``jax.named_scope`` so device profiles decompose the same way BASELINE.md
does.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import classify, fields, interpolator, octree, operator, restriction, stencils, writeback
from .config import SolverConfig, capped_levels


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FluidState:
    """Per-frame inputs on the finest grid (all dense arrays).

    Mirrors the reference's seven DOP field bindings (cpp:138-231).  Solid
    SDF uses the standard convention (negative inside the solid).
    """

    liquid_sdf: jnp.ndarray                 # (nx, ny, nz) cell-sampled
    solid_sdf: jnp.ndarray                  # (nx, ny, nz) cell-sampled
    velocity: Tuple[jnp.ndarray, ...]       # 3 face-sampled (MAC)
    solid_velocity: Tuple[jnp.ndarray, ...] # 3 face-sampled
    viscosity: jnp.ndarray                  # cell-sampled
    density: jnp.ndarray                    # cell-sampled
    dx: float = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveStats:
    iterations: jnp.ndarray
    residual: jnp.ndarray
    octree_dofs: jnp.ndarray
    regular_dofs: jnp.ndarray
    active_cells: jnp.ndarray  # per level
    # f32 pack [iterations, residual, octree_dofs, regular_dofs,
    # counts..., bboxes...] of THIS frame's full-height octree occupancy —
    # produced when solve_viscosity gets ``probe_levels`` so make_solver's
    # async-probe mode can fetch everything the host needs (stats + next
    # frame's crop windows) in ONE device round trip.  None otherwise.
    topology_probe: Optional[jnp.ndarray] = None
    # which CG path actually ran (a trace-time constant): one of
    # "pallas-sharded" (shard_map + fused Pallas kernels), "pallas"
    # (single-device fused Pallas), "v1"/"v1-fused" (whole-array XLA),
    # "refined" (mixed-precision iterative refinement).  Lets callers and
    # tests assert the production path instead of trusting a silent
    # fallback.
    solve_path: str = dataclasses.field(
        default="", metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    velocity: Tuple[jnp.ndarray, ...]   # updated uniform-grid velocity
    stats: SolveStats


def _validate_state(state: FluidState) -> None:
    """Structural validation of the seven input fields — the analog of the
    reference's field checks (cpp:152-231), raised at trace time."""
    res = state.liquid_sdf.shape
    if len(res) != 3:
        raise ValueError(f"liquid_sdf must be 3-D, got {res}")
    for name in ("solid_sdf", "viscosity", "density"):
        f = getattr(state, name)
        if f.shape != res:
            raise ValueError(f"{name} must align with liquid_sdf: {f.shape} != {res}")
    for group, vel in (("velocity", state.velocity),
                       ("solid_velocity", state.solid_velocity)):
        if len(vel) != 3:
            raise ValueError(f"{group} must have 3 staggered components")
        for a in range(3):
            want = tuple(r + (1 if d == a else 0) for d, r in enumerate(res))
            if vel[a].shape != want:
                raise ValueError(
                    f"{group}[{a}] must be face-sampled (MAC): "
                    f"{vel[a].shape} != {want}"
                )
    if state.dx <= 0:
        raise ValueError("dx must be positive")


def padded_shape(shape: Sequence[int], levels: int,
                 mesh_n: int = 1) -> Tuple[int, int, int]:
    """Smallest domain extents >= ``shape`` the octree build accepts.

    The reference stretches any input resolution to the containing power of
    two and clamps ACTIVE cells to the original region
    (/root/reference/Source/HDK_OctreeGrid.cpp:10-24).  The dense pyramid
    only needs divisibility by ``2^(levels-1)`` (gentler than pow2); a 1D
    x-sharded solve additionally needs ``mesh_n | nx_l`` with even local
    widths below the top, i.e. ``(mesh_n << (levels-1)) | nx``.  Padding is
    INACTIVE (positive SDF), so it adds no DOFs and the occupied-region crop
    windows sweep none of it.
    """
    m = 1 << max(0, levels - 1)
    mx = m * max(1, mesh_n)
    mults = (mx, m, m)
    return tuple(-(-int(s) // q) * q for s, q in zip(shape, mults))


def _pad_state(state: FluidState, target: Sequence[int]) -> FluidState:
    """Pad every field of ``state`` to cell resolution ``target``.

    SDFs get a large positive constant (far outside liquid, far from solid
    -> the refinement mask labels the pad INACTIVE); velocities pad with
    zero; viscosity/density replicate their edge values (keeps them
    positive for the SPD system).  Padding appends on the high side only,
    so cell/face coordinates of the original region are unchanged.
    """
    res = state.liquid_sdf.shape
    pads = tuple(int(t) - int(s) for s, t in zip(res, target))
    if not any(pads):
        return state
    cell_pad = tuple((0, p) for p in pads)
    far = jnp.asarray(4.0 * state.dx * max(target), state.liquid_sdf.dtype)

    def pad_face(v, axis):
        return jnp.pad(v, cell_pad, constant_values=0)

    return dataclasses.replace(
        state,
        liquid_sdf=jnp.pad(state.liquid_sdf, cell_pad, constant_values=far),
        solid_sdf=jnp.pad(state.solid_sdf, cell_pad, constant_values=far),
        velocity=tuple(pad_face(v, a) for a, v in enumerate(state.velocity)),
        solid_velocity=tuple(
            pad_face(v, a) for a, v in enumerate(state.solid_velocity)),
        viscosity=jnp.pad(state.viscosity, cell_pad, mode="edge"),
        density=jnp.pad(state.density, cell_pad, mode="edge"),
    )


def solve_viscosity(
    state: FluidState,
    dt,
    config: SolverConfig = SolverConfig(),
    face_weights: Optional[Sequence[jnp.ndarray]] = None,
    mesh=None,
    mesh_axis: str = "x",
    pallas_bboxes=None,
    probe_levels: Optional[int] = None,
    pad_levels: Optional[int] = None,
) -> SolveResult:
    """One viscosity solve (the reference's per-frame solveGasSubclass).

    ``face_weights`` are the host FLIP loop's face volume fractions
    ("surfaceweights", cpp:144); computed internally when omitted.

    ``mesh``: a 1D ``jax.sharding.Mesh`` for an explicitly distributed
    solve.  Build/stencil/writeback stages stay whole-array (GSPMD shards
    them); the CG stage — the hot loop — runs the fused Pallas matvec
    under ``shard_map`` with ``ppermute`` halo exchange and ``psum`` dot
    products (parallel/shard_pallas.py).  Without a mesh, a Pallas solve
    is single-device (the manual-DMA kernels are not GSPMD-partitionable);
    if the grid does not admit the 1D decomposition the solve falls back
    to the (GSPMD-shardable) whole-array operator.

    ``pallas_bboxes``: per-level static crop windows (from
    :func:`probe_topology`) shrinking the Pallas canonical boxes to the
    occupied region; ``make_solver`` supplies them automatically.

    ``probe_levels``: when set (the UNtrimmed configured level count),
    the solve additionally computes this frame's full-height octree
    occupancy (reusing the refinement mask) and packs it with the solve
    counters into ``stats.topology_probe`` — one fetchable array carrying
    everything ``make_solver``'s async-probe mode needs.
    """
    _validate_state(state)
    if config.dtype is not None:
        # the solve-precision switch (USESINGLEPRECISION, HDK_Utilities.h:25-37)
        state = dataclasses.replace(
            state,
            liquid_sdf=state.liquid_sdf.astype(config.dtype),
            solid_sdf=state.solid_sdf.astype(config.dtype),
            velocity=tuple(v.astype(config.dtype) for v in state.velocity),
            solid_velocity=tuple(v.astype(config.dtype)
                                 for v in state.solid_velocity),
            viscosity=state.viscosity.astype(config.dtype),
            density=state.density.astype(config.dtype),
        )
    dx = state.dx
    extrapolation = config.extrapolation * dx
    orig_res = tuple(state.liquid_sdf.shape)
    levels = capped_levels(orig_res, config.octree_levels)
    # automatic domain padding (HDK_OctreeGrid.cpp:10-24): any resolution is
    # legal input; the pyramid build needs divisibility by 2^(levels-1) (and
    # the sharded CG needs mesh_n | nx_l), so pad with INACTIVE cells and
    # crop the output velocity back.  The pad multiple always covers the
    # FULL configured pyramid, not just this specialization's trimmed
    # ``levels``: make_solver passes the original configured count through
    # ``pad_levels`` (and the async-probe mode through ``probe_levels``),
    # so probe window coordinates stay valid across every specialization.
    lv_pad = levels
    for extra in (pad_levels, probe_levels):
        if extra is not None:
            lv_pad = max(lv_pad, capped_levels(orig_res, extra))
    mesh_n = mesh.devices.size if mesh is not None else 1
    target = padded_shape(orig_res, lv_pad, mesh_n)
    if target != orig_res:
        state = _pad_state(state, target)
        if face_weights is not None:
            pads = tuple(int(t) - int(s) for s, t in zip(orig_res, target))
            face_weights = [
                jnp.pad(w, tuple((0, p) for p in pads), constant_values=0)
                for w in face_weights
            ]
    liquid = state.liquid_sdf
    solid = state.solid_sdf
    if pallas_bboxes is not None and len(pallas_bboxes) != levels:
        raise ValueError(
            f"pallas_bboxes has {len(pallas_bboxes)} levels, solve has "
            f"{levels}; pass the level count probe_topology returned"
        )

    with jax.named_scope("compute_surface_weights"):
        center_w, edge_w = fields.integration_weights(
            liquid, solid, config.num_supersamples, extrapolation,
            config.apply_solid_weights,
        )
        if face_weights is None:
            face_w = fields.face_weights(
                liquid, solid, config.num_supersamples, extrapolation,
                config.apply_solid_weights,
            )
        else:
            face_w = list(face_weights)

    with jax.named_scope("build_octree"):
        inner_band = dx * max(2.0, float(config.fine_bandwidth))
        mask = octree.build_refinement_mask(
            liquid, solid, dx, extrapolation, 3.0 * dx, inner_band
        )
        labels = octree.build_octree(mask, levels)

    with jax.named_scope("build_labels"):
        vel_kinds = classify.classify_octree_velocity(
            labels, center_w, edge_w, solid, extrapolation
        )
        edge_kinds = classify.classify_edge_stress(labels, edge_w)
        center_kinds = classify.classify_center_stress(labels, center_w)
        regular_kinds = [
            classify.classify_regular_velocity(center_w, edge_w, solid, extrapolation, a)
            for a in range(3)
        ]

    res_per_level = [tuple(l.shape) for l in labels]
    if pallas_bboxes is not None:
        # clamp probe windows to THIS solve's (padded) level resolutions:
        # quantized windows may extend past them when the probe padded for
        # a taller pyramid than this specialization uses
        pallas_bboxes = tuple(
            tuple(
                (min(int(b[d][0]), max(0, (res[d] - 2) & ~1)),
                 min(int(b[d][1]), res[d]))
                for d in range(3)
            )
            for b, res in zip(pallas_bboxes, res_per_level)
        )
    active = {
        (l, a): vel_kinds[l][a] == classify.FLUID
        for l in range(levels)
        for a in range(3)
    }

    with jax.named_scope("build_stress_stencils"):
        sdtype = state.viscosity.dtype
        blocks = stencils.build_edge_stress_blocks(
            labels, vel_kinds, edge_kinds, edge_w,
            state.viscosity, state.solid_velocity, dt, dx, config,
        ) + stencils.build_center_stress_blocks(
            labels, vel_kinds, center_kinds, center_w,
            state.viscosity, state.solid_velocity, dt, dx, config,
        )
        mass = stencils.build_mass(labels, vel_kinds, face_w, state.density)

    with jax.named_scope("restrict_velocity"):
        guess_raw = restriction.restrict_velocity_pyramid(
            [v.astype(sdtype) for v in state.velocity], levels
        )
        guess = {k: jnp.where(active[k], guess_raw[k], 0.0) for k in active}

    with jax.named_scope("build_system"):
        # rhs and the Jacobi diagonal are one-time per frame: v1 machinery
        _, diag = operator.make_operator(blocks, mass, active, res_per_level)
        rhs = operator.boundary_rhs(blocks, mass, guess, active, res_per_level)

        impl = config.apply_impl
        if impl == "auto":
            # the Pallas path is float32-only; a float64 auto solve keeps
            # full precision via the whole-array apply
            impl = ("pallas" if jax.default_backend() == "tpu"
                    and sdtype != jnp.float64 else "v1-fused")
            if impl == "pallas":
                # VMEM wall: the Pallas kernels carry whole y/z planes per
                # x-slab, so liveness scales with the plane area.  Per
                # level, pallas_apply.level_modes picks the fused kernel
                # (to ~128^3 uncropped), the split tau/D^T pair (~2.4x
                # smaller liveness -> to ~208^3), or reports no fit — in
                # which case the solve routes to the whole-array XLA
                # operator (correct at any size; solve_path records it).
                from .ops import pallas_apply as _pa

                if not _pa.fits_vmem(res_per_level, pallas_bboxes):
                    impl = "v1-fused"
        if config.use_iterative_refinement and impl not in ("v1", "v1-fused"):
            # refinement drives logical-space v1 applies in two precisions
            impl = "v1-fused"
        sharded_pallas = False
        if mesh is not None and impl == "pallas":
            # mesh-aware selection: a manual-DMA pallas_call cannot be
            # GSPMD-partitioned, so a meshed Pallas solve must go through
            # the explicit shard_map path — or fall back to the whole-array
            # operator when the grid doesn't decompose
            from .ops import pallas_apply as _pa
            from .parallel import shard_pallas

            n_mesh = mesh.devices.size
            res_local = [(r[0] // max(1, n_mesh), r[1], r[2])
                         for r in res_per_level]
            if (n_mesh > 1
                    and shard_pallas.shardable_levels(res_per_level, n_mesh)
                    # the shard_map stage runs the FUSED kernels on local
                    # canonical boxes; x-sharding does not shrink the y/z
                    # plane, so the fused VMEM budget must hold locally
                    and all(m == "fused"
                            for m in _pa.level_modes(res_local))):
                sharded_pallas = True
            elif n_mesh > 1:
                impl = "v1-fused"
        if impl == "pallas" and sdtype == jnp.float64:
            # the Pallas kernels are float32-only: build_frame_data and
            # embed_tree cast everything to F32, so an explicit fp64 solve
            # would silently lose precision.  Demand an explicit choice.
            raise ValueError(
                "apply_impl='pallas' computes in float32; for a float64 "
                "solve use use_iterative_refinement=True (fp32 inner CG, "
                "fp64 residual) or apply_impl='v1'/'v1-fused'"
            )
        terms_builder = None
        if impl.endswith("-fused"):
            def terms_builder():
                return stencils.build_edge_stress_blocks(
                    labels, vel_kinds, edge_kinds, edge_w,
                    state.viscosity, state.solid_velocity, dt, dx, config,
                    with_weights=False,
                ) + stencils.build_center_stress_blocks(
                    labels, vel_kinds, center_kinds, center_w,
                    state.viscosity, state.solid_velocity, dt, dx, config,
                    with_weights=False,
                )

        if impl == "pallas" and sharded_pallas:
            apply_A = None  # the shard_map stage builds its own operator
        elif impl == "pallas":
            # fused per-level TPU kernels (interpret mode off-TPU so the
            # same code path stays testable on CPU); levels whose plane
            # exceeds the fused VMEM budget run the split tau/D^T pair
            from .ops import pallas_apply

            modes = pallas_apply.level_modes(res_per_level, pallas_bboxes)
            frame, canons = pallas_apply.build_frame_data(
                labels, vel_kinds, edge_kinds, center_kinds, blocks, mass,
                res_per_level, bboxes=pallas_bboxes, modes=modes,
            )
            apply_A, embed_tree, crop_tree = pallas_apply.make_pallas_operator(
                frame, canons, active, res_per_level, dx,
                config.use_enhanced_gradients,
                interpret=jax.default_backend() != "tpu",
                fused=modes,
            )
        else:
            apply_A, _ = operator.make_operator(
                blocks, mass, active, res_per_level, terms_builder=terms_builder
            )

    if config.use_iterative_refinement:
        solve_path = "refined"
    elif impl == "pallas" and sharded_pallas:
        solve_path = "pallas-sharded"
    else:
        solve_path = impl

    with jax.named_scope("solve"):
        if config.use_iterative_refinement:
            f32 = jnp.float32

            def _cast32(tree):
                return jax.tree_util.tree_map(
                    lambda a: a.astype(f32)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    tree,
                )

            def terms_builder32():
                # rebuild the f32 coefficient arrays from the int8 kind grids
                # inside the inner CG loop (same recompute-over-HBM trade as
                # the v1-fused path; coeff dtype follows viscosity's)
                return stencils.build_edge_stress_blocks(
                    labels, vel_kinds, edge_kinds, edge_w,
                    state.viscosity.astype(f32),
                    tuple(v.astype(f32) for v in state.solid_velocity),
                    dt, dx, config, with_weights=False,
                ) + stencils.build_center_stress_blocks(
                    labels, vel_kinds, center_kinds, center_w,
                    state.viscosity.astype(f32),
                    tuple(v.astype(f32) for v in state.solid_velocity),
                    dt, dx, config, with_weights=False,
                )

            apply_A32, _ = operator.make_operator(
                _cast32(blocks), _cast32(mass), active, res_per_level,
                terms_builder=terms_builder32,
            )
            solution, iters, rel = operator.pcg_refined(
                apply_A, apply_A32, rhs, guess, diag,
                config.tolerance, config.max_iterations,
            )
        elif impl == "pallas" and sharded_pallas:
            from .parallel import shard_pallas

            f32 = jnp.float32
            we = {(b.level, b.axis): b.weight.astype(f32)
                  for b in blocks if b.kind == "edge"}
            wc_by_level = {}
            for b in blocks:
                if b.kind == "center" and b.level not in wc_by_level:
                    wc_by_level[b.level] = b.weight.astype(f32)
            wc = [wc_by_level[l] for l in range(levels)]

            def c32(tree):
                return {k: v.astype(f32) for k, v in tree.items()}

            solution, iters, rel = shard_pallas.sharded_pallas_pcg(
                mesh, mesh_axis,
                vel_kinds, edge_kinds, center_kinds, we, wc,
                c32(mass), active, c32(rhs), c32(guess), c32(diag),
                res_per_level, dx, config.use_enhanced_gradients,
                config.tolerance, config.max_iterations,
                interpret=jax.default_backend() != "tpu",
                cheb_degree=config.cheb_degree,
            )
            solution = {k: v.astype(sdtype) for k, v in solution.items()}
        elif impl == "pallas":
            sol_c, iters, rel = operator.pcg_flat(
                apply_A, embed_tree(rhs), embed_tree(guess),
                embed_tree(diag, fill=1.0),
                config.tolerance, config.max_iterations,
                cheb_degree=config.cheb_degree,
                cancel_poll=config.cancel_poll_iters,
            )
            solution = crop_tree(sol_c)
        else:
            solution, iters, rel = operator.pcg_flat(
                apply_A, rhs, guess, diag, config.tolerance,
                config.max_iterations, cheb_degree=config.cheb_degree,
                cancel_poll=config.cancel_poll_iters,
            )

    with jax.named_scope("interpolate_writeback"):
        interpolated = interpolator.interpolate_writeback_fields(
            labels, solution, vel_kinds, levels
        )

    with jax.named_scope("writeback"):
        new_velocity = writeback.apply_to_regular_grid(
            state.velocity, solution, labels, vel_kinds, regular_kinds,
            state.solid_velocity, levels, interpolated,
        )
        if target != orig_res:
            # crop the padded faces back to the caller's resolution (pads
            # are INACTIVE -> untouched zeros)
            new_velocity = [
                v[tuple(slice(0, orig_res[d] + (1 if d == a else 0))
                        for d in range(3))]
                for a, v in enumerate(new_velocity)
            ]

    probe_pack = None
    if probe_levels is not None:
        with jax.named_scope("topology_probe"):
            full = capped_levels(liquid.shape, probe_levels)
            plabels = labels if full == levels else octree.build_octree(
                mask, full)
            f32 = jnp.float32
            probe_pack = jnp.concatenate([
                jnp.stack([
                    iters.astype(f32) if hasattr(iters, "astype")
                    else jnp.asarray(iters, f32),
                    jnp.asarray(rel, f32),
                ]),
                jnp.asarray(sum(jnp.sum(m) for m in active.values()), f32)[None],
                jnp.asarray(sum(jnp.sum(k == classify.FLUID)
                                for k in regular_kinds), f32)[None],
                octree.active_cell_counts(plabels).astype(f32),
                jnp.stack([b.astype(f32)
                           for b in octree.occupied_bboxes(plabels)]
                          ).reshape(-1),
            ])

    stats = SolveStats(
        iterations=iters,
        residual=rel,
        octree_dofs=sum(jnp.sum(m) for m in active.values()),
        regular_dofs=sum(jnp.sum(k == classify.FLUID) for k in regular_kinds),
        active_cells=octree.active_cell_counts(labels),
        topology_probe=probe_pack,
        solve_path=solve_path,
    )
    return SolveResult(velocity=tuple(new_velocity), stats=stats)


@functools.lru_cache(maxsize=None)
def _levels_probe(shape, levels, dx, extrapolation, fine_bandwidth):
    """Jitted occupancy probe shared across frames of identical geometry."""

    @jax.jit
    def counts(liquid, solid):
        inner_band = dx * max(2.0, float(fine_bandwidth))
        target = padded_shape(liquid.shape, levels)
        if target != tuple(liquid.shape):
            # same INACTIVE padding the solve applies (coordinates of the
            # occupied boxes are pad-invariant: padding appends high-side)
            pads = tuple((0, int(t) - int(s))
                         for s, t in zip(liquid.shape, target))
            far = jnp.asarray(4.0 * dx * max(target), liquid.dtype)
            liquid = jnp.pad(liquid, pads, constant_values=far)
            solid = jnp.pad(solid, pads, constant_values=far)
        mask = octree.build_refinement_mask(
            liquid, solid, dx, extrapolation, 3.0 * dx, inner_band
        )
        labels = octree.build_octree(mask, levels)
        # ONE packed int32 array: [counts, bboxes...] — the probe result is
        # fetched to the host every frame, and each separate fetch pays a
        # full device-tunnel round trip (~35 ms here), so everything the
        # host needs comes back in a single transfer
        cnt = octree.active_cell_counts(labels).astype(jnp.int32)
        bbs = jnp.stack(
            [b.astype(jnp.int32) for b in octree.occupied_bboxes(labels)]
        )
        return jnp.concatenate([cnt, bbs.reshape(-1)])

    return counts


WINDOW_QUANTUM = 16  # hysteresis GROWTH step, not the snap grid: measured
# on the beam scene, snapping the windows themselves to 16 sweeps ~1.7x
# more canonical plane area (the beam's tight level-0 y-window is 24 rows;
# 16-snapped it becomes 48) — a ~1.9x frame regression.  Tight windows keep
# the apply minimal; bounding the recompile population is the job of the
# coarse growth step + the LRU cap in make_solver.


def _tight_windows(raw, res_per_level, margin=2, q=2):
    """Per-level crop windows from the probe's occupied boxes: ``margin``
    covers neighbor kind reads around boundary DOFs, then both ends snap
    outward to the ``q``-cell grid (default 2: the minimum that keeps
    origins even so canonical parity equals logical parity)."""
    out = []
    for bb, res in zip(raw, res_per_level):
        rows = []
        for d in range(3):
            lo, hi = int(bb[d, 0]), int(bb[d, 1])
            if hi <= lo:            # empty level (kept only below the trim)
                lo, hi = 0, min(2, res[d])
            lo = max(0, lo - margin) // q * q
            hi = min(res[d], -(-(hi + margin) // q) * q)
            rows.append((lo, hi))
        out.append(tuple(rows))
    return tuple(out)


def _merge_windows(cached, tight, res_per_level, q=WINDOW_QUANTUM):
    """Hysteresis for the per-solver window cache: keep the compiled window
    while the fluid stays inside it; on violation, extend the violated side
    one extra quantum past the tight bound (preempting further motion in
    that direction) so a moving fluid recompiles in coarse steps, not every
    frame.  Windows only shrink through make_solver's age-out policy (see
    ``_shrink_target``) — the cost of a stale-large window is swept empty
    space, the cost of flapping is a recompile.  All bounds live on the
    ``q``-cell grid."""
    if cached is None:
        return tight
    out = []
    for cw, tw, res in zip(cached, tight, res_per_level):
        rows = []
        for d in range(3):
            lo, hi = cw[d]
            if tw[d][0] < lo:
                # snap the grown bound outward TO the q-grid (not just by
                # q): grown bounds land on shared grid positions, so a
                # steadily moving fluid reuses them instead of minting a
                # fresh window per violation (q even keeps lo parity)
                lo = max(0, (tw[d][0] - q) // q * q)
            if tw[d][1] > hi:
                hi = min(res[d], -(-(tw[d][1] + q) // q) * q)
            rows.append((lo, hi))
        out.append(tuple(rows))
    return tuple(out)


SHRINK_AFTER = 8    # consecutive oversized frames before a re-tighten
SHRINK_RATIO = 1.5  # cached/tight swept-volume ratio that counts as oversized


def _shrink_target(tight, res_per_level, q=WINDOW_QUANTUM):
    """Re-tighten target: the tight window expanded one quantum per side
    onto the shared ``q`` grid (the same positions _merge_windows grows to,
    so a subsequently moving fluid reuses them instead of flapping)."""
    out = []
    for tw, res in zip(tight, res_per_level):
        rows = []
        for d in range(3):
            lo = max(0, (tw[d][0] - q) // q * q)
            hi = min(res[d], -(-(tw[d][1] + q) // q) * q)
            rows.append((lo, hi))
        out.append(tuple(rows))
    return tuple(out)


def _windows_volume(windows) -> int:
    """Total swept cell volume of a window set (the apply cost scales with
    the canonical boxes' volumes)."""
    total = 0
    for w in windows:
        v = 1
        for d in range(3):
            v *= max(0, w[d][1] - w[d][0])
        total += v
    return total


def effective_levels(state: FluidState, config: SolverConfig) -> int:
    """Octree level count with trailing empty levels dropped — the host-side
    analog of the reference's empty-top-level trim
    (/root/reference/Source/HDK_OctreeGrid.cpp:198-211, 877-920).

    A level with zero ACTIVE cells contributes no DOFs, no stencils and no
    couplings, so solving with it removed yields the identical system while
    skipping that level's per-CG-iteration kernel launches.  The probe is a
    small jitted program (mask + octree build + per-level counts), evaluated
    eagerly so the level count is a static (trace-time) quantity.
    """
    return probe_topology(state, config)[0]


def probe_topology(state: FluidState, config: SolverConfig,
                   window_quantum: int = 2):
    """Host-side topology probe: (effective level count, per-level static
    crop windows for the Pallas operator).

    One small jitted program (mask + octree + counts + occupied boxes); the
    results are trace-time constants that specialize the solve pipeline —
    trimmed empty top levels skip whole kernel launches, and the crop
    windows shrink every canonical box to the occupied region (the dense
    full-domain box sweeps mostly empty space when the fluid is small,
    e.g. the beam scene occupies ~7% of its domain).

    ``window_quantum`` overrides the window snap grid (must stay even for
    canonical parity); the default keeps windows tight — recompiles are
    bounded by the coarse hysteresis growth + LRU cap in make_solver."""
    import numpy as np

    levels = capped_levels(state.liquid_sdf.shape, config.octree_levels)
    packed = np.asarray(_levels_probe(  # single fetch: counts + bboxes
        tuple(state.liquid_sdf.shape), levels, state.dx,
        config.extrapolation * state.dx, config.fine_bandwidth,
    )(state.liquid_sdf, state.solid_sdf))
    counts = packed[:levels]
    raw_bboxes = packed[levels:].reshape(levels, 3, 2)
    return _trim_and_window(counts, raw_bboxes, state.liquid_sdf.shape,
                            q=window_quantum)


def _trim_and_window(counts, raw_bboxes, shape, q=2):
    """Shared host-side probe decode: trailing empty levels dropped, then
    per-level crop windows from the occupied boxes.  Window bounds cap at
    the full-height PADDED resolutions (the coordinate system the probe ran
    in); solve_viscosity re-clamps them to whatever pyramid it builds."""
    full = len(counts)
    levels = full
    while levels > 1 and counts[levels - 1] == 0:
        levels -= 1
    pshape = padded_shape(shape, full)
    res_per_level = [tuple(int(s) >> l for s in pshape) for l in range(levels)]
    bboxes = _tight_windows(raw_bboxes[:levels], res_per_level, q=q)
    return levels, bboxes


def decode_topology_probe(packed, shape, full_levels):
    """Host-side decode of ``SolveStats.topology_probe``: returns
    (host_stats_dict, effective levels, crop windows).  ``packed`` is the
    f32 vector [iters, residual, octree_dofs, regular_dofs, counts...,
    bboxes...] for the FULL (untrimmed) ``full_levels``-level pyramid."""
    import numpy as np

    packed = np.asarray(packed)
    head = packed[:4]
    counts = packed[4:4 + full_levels].astype(np.int64)
    raw = packed[4 + full_levels:].reshape(full_levels, 3, 2).astype(np.int64)
    lv, bboxes = _trim_and_window(counts, raw, shape)
    stats = {
        "iterations": np.int64(head[0]),
        "residual": np.float32(head[1]),
        "octree_dofs": np.int64(head[2]),
        "regular_dofs": np.int64(head[3]),
    }
    return stats, lv, bboxes


def make_solver(config: SolverConfig = SolverConfig(),
                auto_trim_levels: bool = True,
                async_probe: bool = True):
    """Solve closure ``solve(state, dt) -> SolveResult``.

    ``auto_trim_levels`` (default on, matching the reference's
    HDK_OctreeGrid.cpp:198-211 behavior) probes the octree occupancy per
    call and dispatches to a pipeline specialized on the trimmed level
    count AND the occupied-region crop windows — empty top levels cost
    per-iteration kernel launches, and full-domain canonical boxes sweep
    empty space.  Windows carry hysteresis (grow-on-violation, never
    shrink) so a slowly moving fluid reuses the compiled program; one
    program is cached per distinct topology key.

    ``async_probe`` (default on): fold the occupancy probe INTO the solve
    program.  Each solve outputs this frame's full-height occupancy
    (``stats.topology_probe``); the NEXT frame dispatches with those
    (one-frame-stale, hysteresis-grown) windows, so a steady-state frame
    costs a single host-device round trip instead of two — on a remote
    device one round trip is ~35 ms, comparable to a small solve itself.
    Correctness is unconditional: the probe of the solved frame is checked
    against the windows actually used, and on a violation (the fluid
    escaped the crop, or the level trim changed) the frame is re-solved
    synchronously with the corrected topology.  The returned stats carry
    host scalars (already fetched), so reading them costs nothing extra.
    """
    from collections import OrderedDict

    jitted = OrderedDict()
    max_programs = 8  # LRU cap: topology drift must not grow the program
    # population without bound (each entry pins a compiled executable)
    window_cache = {}
    slack_age = {}
    carry = {}

    def _dispatch(lv, tight, state, dt):
        cfg = config
        if lv != config.octree_levels:
            cfg = dataclasses.replace(config, octree_levels=lv)
        shape = state.liquid_sdf.shape
        pshape = padded_shape(shape, capped_levels(shape, config.octree_levels))
        res_per_level = [tuple(s >> l for s in pshape) for l in range(lv)]
        cached = window_cache.get(lv)
        bboxes = _merge_windows(cached, tight, res_per_level)
        # window shrink age-out: a fluid that contracted (drained, merged)
        # keeps paying its peak-occupancy sweep under pure grow-only
        # hysteresis.  When the cached window has been >= SHRINK_RATIO x
        # the re-tighten target's swept volume for SHRINK_AFTER consecutive
        # frames, re-tighten — one bounded recompile buys back the sweep.
        if cached is not None and bboxes == cached:
            target = _shrink_target(tight, res_per_level)
            if _windows_volume(cached) > SHRINK_RATIO * max(
                    1, _windows_volume(target)):
                slack_age[lv] = slack_age.get(lv, 0) + 1
                if slack_age[lv] >= SHRINK_AFTER:
                    bboxes = target
                    slack_age[lv] = 0
            else:
                slack_age[lv] = 0
        else:
            slack_age[lv] = 0
        window_cache[lv] = bboxes
        key = (cfg.octree_levels, bboxes, async_probe)
        if key not in jitted:
            pl_ = config.octree_levels if async_probe else None
            jitted[key] = jax.jit(functools.partial(
                lambda c, bb, p, s, t: solve_viscosity(
                    s, t, c, pallas_bboxes=bb, probe_levels=p,
                    pad_levels=config.octree_levels),
                cfg, bboxes, pl_,
            ))
        jitted.move_to_end(key)
        while len(jitted) > max_programs:
            jitted.popitem(last=False)
        return jitted[key](state, dt), bboxes

    def _contained(tight, used):
        return all(
            u[d][0] <= t[d][0] and t[d][1] <= u[d][1]
            for t, u in zip(tight, used) for d in range(3)
        )

    def solve(state: FluidState, dt):
        if not auto_trim_levels:
            key = (config.octree_levels, None, False)
            if key not in jitted:
                jitted[key] = jax.jit(functools.partial(
                    lambda c, s, t: solve_viscosity(s, t, c), config))
            return jitted[key](state, dt)

        if async_probe and "probe" in carry:
            lv, tight = carry["probe"]
        else:
            lv, tight = probe_topology(state, config)
        out, used = _dispatch(lv, tight, state, dt)
        if not async_probe:
            return out

        shape = state.liquid_sdf.shape
        full = capped_levels(shape, config.octree_levels)
        host, lv2, tight2 = decode_topology_probe(
            out.stats.topology_probe, shape, full)
        carry["probe"] = (lv2, tight2)
        if lv2 != lv or not _contained(tight2, used[:lv2]):
            # the solved frame's true occupancy escaped the stale windows
            # (or the trim changed): redo with the corrected topology —
            # tight2 IS this state's probe, so the redo cannot violate
            out, used = _dispatch(lv2, tight2, state, dt)
            host, _, _ = decode_topology_probe(
                out.stats.topology_probe, shape, full)
        stats = dataclasses.replace(
            out.stats,
            iterations=host["iterations"], residual=host["residual"],
            octree_dofs=host["octree_dofs"],
            regular_dofs=host["regular_dofs"],
        )
        return SolveResult(velocity=out.velocity, stats=stats)

    def cache_info():
        """Compiled-program population (for tests / recompile budgeting)."""
        return {"programs": len(jitted),
                "windows": {lv: w for lv, w in window_cache.items()}}

    solve.cache_info = cache_info
    return solve


def octree_geometry_for_state(
    state: FluidState,
    config: SolverConfig = SolverConfig(),
    path: Optional[str] = None,
):
    """The octree debug geometry for a state — the analog of the reference's
    ``doPrintOctree``/``octreeGeometry`` outputs (cpp:78-82, 283-294).

    Returns (positions, pscale, level) arrays; writes a binary PLY when
    ``path`` is given (native exporter with Python fallback).
    """
    import numpy as np

    dx = state.dx
    extrapolation = config.extrapolation * dx
    levels = capped_levels(state.liquid_sdf.shape, config.octree_levels)
    mask = octree.build_refinement_mask(
        state.liquid_sdf, state.solid_sdf, dx, extrapolation, 3.0 * dx,
        dx * max(2.0, float(config.fine_bandwidth)),
    )
    labels = [np.asarray(l) for l in jax.jit(
        lambda m: octree.build_octree(m, levels))(mask)]
    if path is not None:
        from . import native

        native.export_octree_ply(labels, dx, path)
    return octree.octree_geometry(labels, dx)
