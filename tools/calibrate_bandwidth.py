"""Calibrate achievable HBM streaming bandwidth for a banded-matvec kernel.

Question (round 5, VERDICT #3): would materializing the operator's
coefficient planes (A u = sum_s C_s * shift(u, s), frame-constant C_s) beat
the in-register coefficient reconstruction the shipped kernels do?  The
reconstruction is VPU-bound ~6-10x above its traffic floor; the banded form
is pure FMA but reads ~15 coefficient planes per output component.  The
decision hinges on what a many-input streaming FMA kernel actually sustains
on this chip — the round-2 triad measured only ~205 GB/s effective, but
Pallas slab DMA was observed to stream faster.

This tool times a Pallas kernel with NBANDS coefficient inputs + 1 vector
input (x-slab grid, whole y/z planes, same layout as the shipped matvec) at
the 96^3 level-0 canonical plane, plus an XLA whole-array reference, and
prints effective GB/s.

Usage: python tools/calibrate_bandwidth.py [nbands] [reps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def banded_kernel(nbands, u_ref, *refs):
    coeff_refs = refs[:nbands]
    out_ref = refs[nbands]
    acc = coeff_refs[0][...] * u_ref[...]
    # unrolled FMA chain: one shifted-u multiply per band.  Shifts along y
    # (sublane rolls) stand in for the real stencil offsets; traffic and op
    # mix match the banded matvec exactly.
    for i, cref in enumerate(coeff_refs[1:]):
        shift = i % 3  # pltpu.roll requires a non-negative shift
        u = u_ref[...]
        if shift:
            u = pltpu.roll(u, shift, 1)
        acc = acc + cref[...] * u
    out_ref[...] = acc


def main():
    nbands = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    # 96^3 level-0 canonical box (TX=4): ~104 x 112 x 128
    NX, NY, NZ, TX = 104, 112, 128, 4
    K = NX // TX

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (NX, NY, NZ), jnp.float32)
    coeffs = [jax.random.normal(jax.random.PRNGKey(i + 1), (NX, NY, NZ),
                                jnp.float32) for i in range(nbands)]

    grid_spec = pl.GridSpec(
        grid=(K,),
        in_specs=[pl.BlockSpec((TX, NY, NZ), lambda i: (i, 0, 0))] * (nbands + 1),
        out_specs=pl.BlockSpec((TX, NY, NZ), lambda i: (i, 0, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(banded_kernel, nbands),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NX, NY, NZ), jnp.float32),
    )

    # honest protocol (docs/perf_notes.md round 3): the device tunnel costs
    # ~35 ms per forced result, so run K iterations inside ONE jitted
    # fori_loop and force a single scalar; per-iteration cost = total / K.
    K = 100

    def xla_once(u, coeffs):
        acc = coeffs[0] * u
        for i, c in enumerate(coeffs[1:]):
            shift = i % 3
            v = jnp.roll(u, shift, 1) if shift else u
            acc = acc + c * v
        return acc

    @jax.jit
    def run_pallas(u, coeffs):
        def body(_, v):
            out = fn(v, *coeffs)
            return out * (1.0 / (1.0 + jnp.max(jnp.abs(out))))
        return jnp.sum(jax.lax.fori_loop(0, K, body, u))

    @jax.jit
    def run_xla(u, coeffs):
        def body(_, v):
            out = xla_once(v, coeffs)
            return out * (1.0 / (1.0 + jnp.max(jnp.abs(out))))
        return jnp.sum(jax.lax.fori_loop(0, K, body, u))

    nbytes = (nbands + 2) * u.size * 4  # coeffs + u + out, per iteration

    for name, f in [("pallas", run_pallas), ("xla", run_xla)]:
        float(f(u, coeffs))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(u, coeffs))
            best = min(best, time.perf_counter() - t0)
        per_iter = best / K
        gbs = nbytes / per_iter / 1e9
        print(f"{name}: nbands={nbands} bytes={nbytes/1e6:.1f}MB/iter "
              f"best={per_iter*1e3:.3f}ms/iter -> {gbs:.0f} GB/s")


if __name__ == "__main__":
    main()
