"""On-device A/B of the merged multi-level kernel (AVS_PALLAS_MERGE).

Runs the full frame solve at a given n for each merge mode in SUBPROCESSES
(the knob is import-resolved), printing frame ms + iteration count.

    python tools/profile_merge.py [n=96] [scene=buckling] [reps=6]
"""

import json
import os
import subprocess
import sys

_SNIPPET = """
import json, os, time
import jax, jax.numpy as jnp
from adaptiveviscositysolver_tpu import scenes
from adaptiveviscositysolver_tpu.config import SolverConfig
from adaptiveviscositysolver_tpu.solver import make_solver

scene, n, reps = os.environ["S_SCENE"], int(os.environ["S_N"]), int(os.environ["S_REPS"])
state = getattr(scenes, scene)(n=n)
solve = make_solver(SolverConfig(octree_levels=4, tolerance=1e-4))
dt = jnp.float32(1.0 / 24.0)

def run():
    out = solve(state, dt)
    float(out.stats.residual)
    return out

out = run()
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    out = run()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"mode": os.environ.get("AVS_PALLAS_MERGE", "coarse"),
                  "frame_ms": round(best * 1e3, 2),
                  "iters": int(out.stats.iterations),
                  "path": out.stats.solve_path}))
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    scene = sys.argv[2] if len(sys.argv) > 2 else "buckling"
    reps = sys.argv[3] if len(sys.argv) > 3 else "6"
    for mode in ("off", "coarse", "all"):
        env = dict(os.environ)
        env.update({"AVS_PALLAS_MERGE": mode, "S_SCENE": scene,
                    "S_N": str(n), "S_REPS": reps})
        out = subprocess.run([sys.executable, "-c", _SNIPPET], env=env,
                             capture_output=True, text=True, timeout=1800)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else None
        if out.returncode != 0 or not line:
            print(f"{mode}: FAILED\n{out.stderr[-1500:]}")
        else:
            print(line)


if __name__ == "__main__":
    main()
