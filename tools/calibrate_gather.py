"""Calibrate 1D gather / scatter throughput on the live chip.

Decides the packed-DOF CG question (round 5): carrying CG state as a
~471k-element packed vector (gathered from / scattered into the ~7M-element
canonical tree at the matvec boundary) only wins if XLA:TPU gather/scatter
of ~500k arbitrary indices runs in well under 0.1 ms.  Honest fori-loop
protocol (one scalar force per K iterations).

Usage: python tools/calibrate_gather.py [ndof] [total] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    ndof = int(sys.argv[1]) if len(sys.argv) > 1 else 471_000
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 7_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    K = 100

    key = jax.random.PRNGKey(0)
    # sorted unique-ish indices (real dof indices are sorted by construction)
    idx = jnp.sort(
        jax.random.randint(key, (ndof,), 0, total, jnp.int32)
    )
    big = jax.random.normal(jax.random.PRNGKey(1), (total,), jnp.float32)

    @jax.jit
    def run_gather(big, idx):
        def body(_, v):
            g = v[idx]                      # gather ndof from total
            return big * (1.0 / (1.0 + jnp.max(jnp.abs(g))))
        return jnp.sum(jax.lax.fori_loop(0, K, body, big))

    @jax.jit
    def run_scatter(big, idx):
        small = big[:idx.shape[0]]

        def body(_, s):
            out = jnp.zeros((total,), jnp.float32).at[idx].set(s)
            return small * (1.0 / (1.0 + jnp.max(jnp.abs(out))))
        return jnp.sum(jax.lax.fori_loop(0, K, body, small))

    @jax.jit
    def run_roundtrip(big, idx):
        small = big[:idx.shape[0]]

        def body(_, s):
            out = jnp.zeros((total,), jnp.float32).at[idx].set(s)
            g = out[idx]
            return g * (1.0 / (1.0 + jnp.max(jnp.abs(g))))
        return jnp.sum(jax.lax.fori_loop(0, K, body, small))

    for name, f in [("gather", run_gather), ("scatter", run_scatter),
                    ("roundtrip", run_roundtrip)]:
        float(f(big, idx))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(big, idx))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: ndof={ndof} total={total} "
              f"{best / K * 1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
