"""A/B: Chebyshev-preconditioned CG inside the SHARDED (CPU-mesh) solve.

VERDICT r4 #7: the Chebyshev preconditioner is a measured net-loss on the
single chip (docs/perf_notes.md: degree 3 = 360 effective applies vs 262
plain Jacobi), but its design rationale is the MULTI-CHIP mesh, where every
CG dot is a psum that synchronizes all devices.  This tool produces the
honest multi-chip record: outer-iteration counts AND per-solve collective
counts (psum dots vs halo ppermutes) for cheb_degree 1 vs 3 on an N-device
CPU mesh running the real sharded Pallas CG (interpret mode — wall time on
a CPU mesh is meaningless, the synchronization *counts* are the evidence).

Usage: python tools/ab_cheb_sharded.py [n=16] [levels=2] [n_mesh=2]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptiveviscositysolver_tpu.parallel import shard_pallas  # noqa: E402
from tests.test_sharding_fast import _build_inputs  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_mesh = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    tol = 1e-4

    (vk, ek, ck, we, wc, mass, active, rhs, guess, diag, rpl, dx) = \
        _build_inputs(n=n, levels=levels)
    mesh = Mesh(np.array(jax.devices("cpu")[:n_mesh]), ("x",))

    for degree in (1, 3):
        def run(degree=degree):
            return shard_pallas.sharded_pallas_pcg(
                mesh, "x", vk, ek, ck, we, wc, mass, active, rhs, guess,
                diag, rpl, dx, True, tol, 500, interpret=True,
                cheb_degree=degree)

        # collective counts per lowered module: _flat_pcg lowers the apply
        # twice (init residual + loop body), so per-OUTER-iteration comms =
        # body counts; count from StableHLO (tracing only)
        txt = jax.jit(run).lower().as_text()
        n_ppermute = txt.count("collective_permute")
        n_allreduce = txt.count("all_reduce")

        _, iters, rel = jax.jit(run)()
        iters = int(iters)
        # per-outer comms: degree-d Chebyshev runs d applies per
        # preconditioner call + 1 CG matvec; dots per outer stay 3
        # (p.ap, rr, rz) — psum count per solve is what the polynomial
        # amortizes.  12-apply spectral estimate is one-time.
        # cheb_degree=1 IS plain Jacobi (no operator inside M^-1): 1 apply
        # per outer + 1 init; degree k>1 pays k precond applies + 1 matvec
        # per outer, plus the one-time 12-apply spectral estimate
        applies = (iters * ((degree + 1) if degree > 1 else 1) + 1
                   + (12 if degree > 1 else 0))
        print(f"cheb_degree={degree}: outer_iters={iters} rel={float(rel):.2e} "
              f"lowered_ppermute={n_ppermute} lowered_allreduce={n_allreduce} "
              f"psum_dots_per_solve={3 * iters + 3} "
              f"applies_per_solve~={applies}")


if __name__ == "__main__":
    main()
