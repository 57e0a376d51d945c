"""Time each cross-level glue op of the Pallas apply in isolation.

    python -m tools.bench_c2c [n] [K]

Compares, per level pair, the canonical-to-canonical ops
(up_view_c2c / up_adjoint_c2c / cs_view_c2c / cs_adjoint_c2c) against the
logical-shape path (crop -> upread/child_sum/adjoint -> embed) they replace.
Each op is chained K times in a scan with a data dependency through the
carry so XLA cannot hoist it.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from adaptiveviscositysolver_tpu.ops import pallas_apply as pa
from adaptiveviscositysolver_tpu.ops.arrayops import (
    face_child_sum,
    face_child_sum_adjoint,
    face_shape,
    upread,
    upread_adjoint,
)


def timed(fn, reps=3):
    out = fn()
    float(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best


def rep_op(op, x, K):
    @jax.jit
    def run(x):
        def body(c, _):
            o = op(c)
            # scalar feedback serializes iterations without growing the carry
            return c * (1.0 + 0.0 * jnp.sum(o[:1, :1, :8])), None
        c, _ = lax.scan(body, x, None, length=K)
        return jnp.sum(c[:1, :1, :8])

    return run(x)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    res = [(n >> l,) * 3 for l in range(2)]
    canons = [pa.make_canon(r) for r in res]
    cf, cc = canons[0], canons[1]
    f = 0

    key = jax.random.PRNGKey(0)
    uc = jax.random.normal(key, cc.shape, jnp.float32)
    uf = jax.random.normal(key, cf.shape, jnp.float32)

    def fsh(l):
        return face_shape(res[l], f)

    cases = [
        ("up_view_c2c ", uc, lambda x: pa.up_view_c2c(x, cc, cf)),
        ("up_view_old ", uc, lambda x: pa.embed(
            upread(pa.crop(x, cc, fsh(1)), fsh(0)), cf, 0.0)),
        ("up_adj_c2c  ", uf, lambda x: pa.up_adjoint_c2c(x, cf, cc)),
        ("up_adj_old  ", uf, lambda x: pa.embed(
            upread_adjoint(pa.crop(x, cf, fsh(0)), fsh(1)), cc, 0.0)),
        ("cs_view_c2c ", uf, lambda x: pa.cs_view_c2c(x, cf, cc, f)),
        ("cs_view_old ", uf, lambda x: pa.embed(
            face_child_sum(pa.crop(x, cf, fsh(0)), f, fsh(1)), cc, 0.0)),
        ("cs_adj_c2c  ", uc, lambda x: pa.cs_adjoint_c2c(x, cc, cf, f)),
        ("cs_adj_old  ", uc, lambda x: pa.embed(
            face_child_sum_adjoint(pa.crop(x, cc, fsh(1)), f, fsh(0)),
            cf, 0.0)),
    ]

    for name, x, op in cases:
        t = timed(lambda op=op, x=x: rep_op(op, x, K))
        print(f"{name}: {t / K * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
