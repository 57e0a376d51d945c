"""Benchmark: per-frame adaptive viscosity solve wall-clock on the live chip.

Covers BASELINE.md's two canonical workloads (the reference's
/root/reference/Scenes/viscousBeam.hip and viscousBuckling.hip analogs):

* ``beam_64_frame_solve``      — printed first (informational)
* ``buckling_96_frame_solve``  — the headline metric (BASELINE.md: 96^3,
  4 octree levels, tolerance 1e-4), printed LAST so the driver's
  one-JSON-line parse records it.

Budget discipline (round-4 postmortem: the bench outgrew the driver budget
and timed out after one record, so the headline was never written):

* the headline record is computed FIRST (right after the cheap beam point)
  and printed immediately; the optional extras (on-device equality check,
  192^3 scale point) run afterwards in SUBPROCESSES with hard timeouts and
  the headline is re-printed with them attached.  Whatever dies mid-extras,
  the last complete JSON line is always a headline record.
* the full-frame CPU baselines (a fresh XLA:CPU process running the same
  pipeline — minutes of compile each) are measured ONCE and persisted in
  ``CPU_BASELINES.json``; the bench reads the cache and only re-measures
  when the entry is missing (bounded) or ``AVS_BENCH_REMEASURE_CPU=1``.

``value``        — full per-frame solve (octree build + classification +
                   stencils + restriction + CG + interpolated writeback) on
                   the TPU, milliseconds, best of N after warm-up.
``vs_baseline``  — speedup vs the CPU solving the *same assembled system*
                   with scipy's Jacobi-preconditioned CG from the same
                   initial guess to the same tolerance (median of 5 runs): a
                   stand-in for the reference's Eigen-CG hot path
                   (HDK_AdaptiveViscosity.cpp:611-631).  The real reference
                   frame also pays octree build + assembly on the CPU, so
                   this baseline understates the true speedup.
``vs_baseline_frame`` — full-frame speedup vs the cached XLA:CPU frame
                   (``baseline_frame_cpu_ms``; threads recorded — this
                   1-CPU host understates the reference's multithreaded
                   Eigen bar).
``stages``       — coarse decomposition (ms): ``build`` = octree build +
                   classification + stencils + restriction as its own jitted
                   scalar-checksum program; ``solve`` = frame minus build.
``octree_levels_used`` reflects the reference's empty-top-level trim
(HDK_OctreeGrid.cpp:198-211) applied per frame.
"""

import json
import os
import statistics
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_HERE, ".jax_cache")
# subprocess slices inherit the env var (set before THEIR interpreter
# starts, so it lands in the config default even though the container's
# sitecustomize imports jax first); for THIS process the env default was
# already bound, so set the config explicitly below
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
_CPU_BASELINES = os.path.join(_HERE, "CPU_BASELINES.json")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
# Measured (round 5, tools-level A/B with cache-hit DEBUG logs): the cache
# WORKS — entries are written and fresh processes HIT — but on this
# container's tunneled backend `deserialize_executable` goes through the
# same remote service as compilation and costs just as much (toy matmul:
# 212 s compile vs 274 s cached-hit under the same load), so
# ``compile_cached_s`` measures remote-service latency, not cache
# effectiveness.  It is still recorded for cross-round comparability.


_SUB_SNIPPET = """
import json, os, time
import numpy as np
import jax, jax.numpy as jnp
from adaptiveviscositysolver_tpu import scenes
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.solver import make_solver

scene, n, reps = os.environ["AVS_SUB_SCENE"], int(os.environ["AVS_SUB_N"]), int(os.environ["AVS_SUB_REPS"])
state = getattr(scenes, scene)(n=n)
config = SolverConfig(octree_levels=4, tolerance=1e-4)
solve = make_solver(config)
dt = jnp.float32(1.0 / 24.0)

def run():
    out = solve(state, dt)
    float(out.stats.residual)  # scalar force (bulk tunnel fetch would dominate)

t0 = time.perf_counter()
run()
first_s = time.perf_counter() - t0
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"first_s": round(first_s, 2), "steady_ms": round(best * 1e3, 2)}))
"""


def _run_subprocess_bench(scene, n, reps, extra_env, timeout_s):
    """Run the frame solve in a fresh interpreter; parse its one-line JSON."""
    env = dict(os.environ)
    env.update(extra_env)
    env.update({"AVS_SUB_SCENE": scene, "AVS_SUB_N": str(n),
                "AVS_SUB_REPS": str(reps)})
    try:
        out = subprocess.run(
            [sys.executable, "-c", _SUB_SNIPPET], env=env, timeout=timeout_s,
            capture_output=True, text=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        import traceback

        traceback.print_exc(file=sys.stderr)
        return None


def _load_cpu_baselines():
    try:
        with open(_CPU_BASELINES) as f:
            return json.load(f)
    except Exception:
        return {}


def _cpu_frame_baseline(scene_name, n, timeout_s):
    """Full-frame XLA:CPU baseline, cached in CPU_BASELINES.json.

    The measurement is a fresh-process compile + run of the whole pipeline
    on the host CPU (minutes); re-measuring it every bench run is what blew
    the round-4 budget, so it is persisted keyed by (scene, n, threads)."""
    key = f"{scene_name}:{n}:t{os.cpu_count()}"
    cache = _load_cpu_baselines()
    if key in cache and os.environ.get("AVS_BENCH_REMEASURE_CPU", "") != "1":
        return cache[key], True
    rec = _run_subprocess_bench(
        scene_name, n, reps=2,
        extra_env={"JAX_PLATFORMS": "cpu"}, timeout_s=timeout_s,
    )
    if rec is not None:
        rec["threads"] = os.cpu_count()
        rec["measured"] = time.strftime("%Y-%m-%d")
        cache[key] = rec
        try:
            with open(_CPU_BASELINES, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except OSError:
            pass
    return rec, False


class _SkipScipy(Exception):
    pass


def bench_scene(metric, scene_name, n, config, reps=6, sub_cached=True,
                cpu_frame=True, cpu_frame_timeout=1800, scipy_baseline=True):
    from adaptiveviscositysolver_tpu import (
        classify, export, fields, octree, restriction, scenes, stencils,
    )
    from adaptiveviscositysolver_tpu.solver import effective_levels, make_solver

    state = getattr(scenes, scene_name)(n=n)
    dt = jnp.float32(1.0 / 24.0)
    # auto-trim (reference empty-top-level behavior, HDK_OctreeGrid.cpp:198-211);
    # the occupancy probe runs inside the timed region — it is per-frame work
    solve = make_solver(config)

    def run_blocking():
        out = solve(state, dt)
        # force completion via a data-dependent SCALAR output: fetching any
        # output buffer of the jitted program requires the whole execution
        # (writeback included — same program) to finish, while a scalar
        # avoids timing the device tunnel's bulk egress (~65 MB/s measured;
        # a local-PCIe user would pay well under 1 ms for the field).
        # block_until_ready is NOT used: it can return early through the
        # tunnel.
        float(out.stats.residual)
        return out

    t0 = time.perf_counter()
    out = run_blocking()
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run_blocking()
        best = min(best, time.perf_counter() - t0)
    tpu_ms = best * 1e3

    # ---- stage decomposition + CPU baseline on the same assembled system
    levels = effective_levels(state, config)
    dx = state.dx
    extrap = config.extrapolation * dx

    @jax.jit
    def build_parts(st):
        cw, ew = fields.integration_weights(
            st.liquid_sdf, st.solid_sdf, config.num_supersamples, extrap, False)
        fw = fields.face_weights(
            st.liquid_sdf, st.solid_sdf, config.num_supersamples, extrap, False)
        mask = octree.build_refinement_mask(
            st.liquid_sdf, st.solid_sdf, dx, extrap, 3 * dx,
            dx * max(2.0, float(config.fine_bandwidth)))
        labels = octree.build_octree(mask, levels)
        vk = classify.classify_octree_velocity(labels, cw, ew, st.solid_sdf, extrap)
        ek = classify.classify_edge_stress(labels, ew)
        ck = classify.classify_center_stress(labels, cw)
        blocks = stencils.build_edge_stress_blocks(
            labels, vk, ek, ew, st.viscosity, st.solid_velocity, dt, dx, config,
        ) + stencils.build_center_stress_blocks(
            labels, vk, ck, cw, st.viscosity, st.solid_velocity, dt, dx, config,
        )
        mass = stencils.build_mass(labels, vk, fw, st.density)
        guess = restriction.restrict_velocity_pyramid(list(st.velocity), levels)
        guess = {k: jnp.where(vk[k[0]][k[1]] == classify.FLUID, guess[k], 0.0)
                 for k in mass}
        # checksum scalar: forcing it completes the whole build program
        # without fetching a bulk array through the slow tunnel
        chk = sum(jnp.sum(m) for m in mass.values())
        return blocks, mass, vk, guess, chk

    # stage timing runs a SCALAR-ONLY build program: build_parts returns
    # every coefficient array as a program output, which forces XLA to
    # materialize + lay out ~100s of MB it would otherwise fuse away — the
    # round-3 beam artifact timed that program and published build=872 ms
    # against a 140 ms frame.  build_chk reduces EVERY build product into
    # one scalar (so nothing is DCE'd and the whole build still executes)
    # without any bulk outputs, so build + solve ~= frame by construction.
    @jax.jit
    def build_chk(st):
        parts = build_parts.__wrapped__(st)[:-1]
        leaves = jax.tree_util.tree_leaves(parts)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)

    def run_build():
        float(build_chk(state))

    run_build()  # compile
    build_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_build()
        build_best = min(build_best, time.perf_counter() - t0)
    build_ms = build_best * 1e3

    baseline_ms = None
    cg_iters_cpu = None
    # scipy solve-only baseline: skipped on big grids — fetching the
    # assembled system through the device tunnel would blow the slice
    # budget; the cached full-frame CPU baseline remains the comparison
    try:
        if not scipy_baseline:
            raise _SkipScipy
        import scipy.sparse.linalg as spla

        blocks, mass, vk, guess, _ = jax.device_get(build_parts(state))
        A, rhs, vel_idx, ndof = export.export_sparse_system(
            blocks, mass, vk, guess,
            [tuple(int(d) >> l for d in state.liquid_sdf.shape)
             for l in range(levels)])
        x0 = np.zeros(ndof)
        for l in range(levels):
            for a in range(3):
                idx = vel_idx[l][a]
                sel = idx >= 0
                x0[idx[sel]] = np.asarray(guess[(l, a)])[sel]
        minv = 1.0 / A.diagonal()
        M = spla.LinearOperator(A.shape, matvec=lambda v: minv * v)

        times = []
        for _ in range(5):  # median of 5: single runs are too noisy to
            it = [0]        # drive optimization decisions (VERDICT r1)

            def cb(_):
                it[0] += 1

            t0 = time.perf_counter()
            x, info = spla.cg(A, rhs, x0=x0, rtol=config.tolerance,
                              maxiter=config.max_iterations, M=M, callback=cb)
            times.append((time.perf_counter() - t0) * 1e3)
            cg_iters_cpu = it[0]
        baseline_ms = statistics.median(times)
    except _SkipScipy:
        pass
    except Exception:
        import traceback

        traceback.print_exc(file=sys.stderr)

    # full-frame CPU baseline: the SAME pipeline (build + stencils + CG +
    # writeback) on the host CPU via XLA:CPU — the apples-to-apples frame
    # number (the reference pays octree build + assembly on the CPU too).
    # Served from CPU_BASELINES.json; measured (bounded) only when missing.
    cpu_rec, cpu_cached = (None, False)
    if cpu_frame and os.environ.get("AVS_BENCH_SKIP_CPU_FRAME", "") != "1":
        cpu_rec, cpu_cached = _cpu_frame_baseline(
            scene_name, n, timeout_s=cpu_frame_timeout)

    # cold-start with a warm compilation cache: fresh interpreter, same
    # JAX_COMPILATION_CACHE_DIR (populated by this process's compiles)
    cached = None
    if sub_cached and os.environ.get("AVS_BENCH_SKIP_CACHED", "") != "1":
        cached = _run_subprocess_bench(
            scene_name, n, reps=1, extra_env={}, timeout_s=600,
        )

    return {
        "metric": metric,
        "value": round(tpu_ms, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / tpu_ms, 2) if baseline_ms else None,
        "baseline": "scipy Jacobi-CG (CPU) median-of-5 on the same system, "
                    "solve stage only",
        "baseline_ms": round(baseline_ms, 2) if baseline_ms else None,
        "baseline_threads": os.cpu_count(),
        "baseline_frame_cpu_ms": cpu_rec["steady_ms"] if cpu_rec else None,
        "baseline_frame_cpu_cached": cpu_cached,
        "vs_baseline_frame": (
            round(cpu_rec["steady_ms"] / tpu_ms, 2) if cpu_rec else None
        ),
        "cg_iterations": int(out.stats.iterations),
        "cpu_cg_iterations": cg_iters_cpu,
        "residual": float(out.stats.residual),
        "octree_dofs": int(out.stats.octree_dofs),
        "regular_dofs": int(out.stats.regular_dofs),
        "octree_levels_used": levels,
        "solve_path": out.stats.solve_path,
        "stages": {"build": round(build_ms, 2),
                   "solve": round(max(0.0, tpu_ms - build_ms), 2)},
        "compile_s": round(compile_s, 1),
        "compile_cached_s": cached["first_s"] if cached else None,
    }


def _run_bench_slice(only, timeout_s, extra_env=None):
    """Re-invoke this script with AVS_BENCH_ONLY=<only> under a hard
    timeout; parse its one JSON line.  Extras (device check, scale point)
    run this way so a hang or crash costs a bounded slice of the budget,
    never the headline."""
    env = dict(os.environ)
    env.update(extra_env or {})
    env["AVS_BENCH_ONLY"] = only
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            timeout=timeout_s, capture_output=True, text=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        import traceback

        traceback.print_exc(file=sys.stderr)
        return None


def main():
    from adaptiveviscositysolver_tpu.config import SolverConfig

    config = SolverConfig(octree_levels=4, tolerance=1e-4)
    only = os.environ.get("AVS_BENCH_ONLY", "")

    if only == "devcheck":
        # on-device equality artifact (VERDICT r3 #8): fused Pallas matvec
        # and an end-to-end solve cross-checked against the v1 operator on
        # the live chip
        from tools import device_check as dc

        print(json.dumps(dc.run(48)), flush=True)
        return
    if only == "big":
        # scale point past the Pallas VMEM wall (VERDICT r3 #2): what runs
        # above ~128^3 and how it scales; leaner protocol than the headline
        n_big = int(os.environ.get("AVS_BENCH_N_BIG", "192"))
        print(json.dumps(bench_scene(
            f"buckling_{n_big}_frame_solve", "buckling", n_big, config,
            reps=3, sub_cached=False, cpu_frame_timeout=3600,
            scipy_baseline=n_big < 224)), flush=True)
        return

    if os.environ.get("AVS_BENCH_SKIP_BEAM", "") != "1":
        n_beam = int(os.environ.get("AVS_BENCH_N_BEAM", "64"))
        print(json.dumps(bench_scene(
            f"beam_{n_beam}_frame_solve", "beam", n_beam, config)),
            flush=True)

    # ---- headline: computed FIRST among the heavy work and printed
    # immediately; extras attach afterwards and the record re-prints, so
    # the LAST complete JSON line is always a headline record.
    n = int(os.environ.get("AVS_BENCH_N", "96"))
    rec = bench_scene(f"buckling_{n}_frame_solve", "buckling", n, config)
    print(json.dumps(rec), flush=True)

    if os.environ.get("AVS_BENCH_SKIP_DEVCHECK", "") != "1":
        rec["device_check"] = _run_bench_slice("devcheck", timeout_s=900)
        print(json.dumps(rec), flush=True)
    if os.environ.get("AVS_BENCH_SKIP_BIG", "") != "1":
        rec["scale_point"] = _run_bench_slice("big", timeout_s=1500)
        print(json.dumps(rec), flush=True)
    if os.environ.get("AVS_BENCH_SKIP_BIG256", "") != "1":
        # second scale point: 256^3 runs the y-brick Pallas kernels (past
        # the split pair's VMEM wall); CPU frame served from the cache
        rec["scale_point_256"] = _run_bench_slice(
            "big", timeout_s=1500, extra_env={"AVS_BENCH_N_BIG": "256"})
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
