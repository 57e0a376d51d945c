"""Microbenchmark: 2x upsample-interleave strategies on the live chip.

    python -m tools.bench_upsample [reps]

The cross-level glue of the Pallas apply needs, per level pair and face
axis, a canonical-to-canonical 2x upsample (``out[v] = src[(v>>1)+A]``) and
its adjoint (pair-sum downsample).  Three candidate lowerings:

* ``repeat``   — chained ``jnp.repeat`` per axis (round-2/3 shipped glue):
                 each repeat is a transposed-layout copy on TPU.
* ``reshape``  — one broadcast + reshape interleave: the (…,2,…,2,…,2) →
                 (2X,2Y,2Z) reshape is a minor-dim lane/sublane shuffle.
* ``matmul``   — per-axis 0/1 expansion matrices contracted with einsum:
                 the minor-dim interleaves ride the MXU instead of the
                 shuffle network.

Each is timed as K chained applies of up+down (loop-carried, scalar-forced)
at the 96^3 level-1 -> level-0 canonical shape.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    K = 50
    # 96^3 buckling canonical shapes: coarse level-1 box, fine level-0 box
    CS = (32, 64, 128)
    FS = (64, 128, 256)  # exactly 2x so the up+down round trip is shape-stable

    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, CS, jnp.float32)

    def up_repeat(c):
        out = c
        for d in range(3):
            out = jnp.repeat(out, 2, axis=d)
        return out[: FS[0], : FS[1], : FS[2]]

    def down_repeat(f):
        x = f
        for d in range(3):
            shp = x.shape[:d] + (x.shape[d] // 2, 2) + x.shape[d + 1:]
            x = x.reshape(shp).sum(axis=d + 1)
        return x[: CS[0], : CS[1], : CS[2]]

    def up_reshape(c):
        X, Y, Z = c.shape
        b = jnp.broadcast_to(c[:, None, :, None, :, None], (X, 2, Y, 2, Z, 2))
        return b.reshape(2 * X, 2 * Y, 2 * Z)[: FS[0], : FS[1], : FS[2]]

    def down_reshape(f):
        X, Y, Z = f.shape
        return f.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).sum(
            axis=(1, 3, 5))[: CS[0], : CS[1], : CS[2]]

    def expand_mat(n_out, n_in):
        """E[(j), (i)] = 1 where j>>1 == i (column-major contraction)."""
        j = np.arange(n_out)
        e = np.zeros((n_in, n_out), np.float32)
        e[np.minimum(j >> 1, n_in - 1), j] = (j >> 1 < n_in)
        return jnp.asarray(e)

    EX = expand_mat(FS[0], CS[0])
    EY = expand_mat(FS[1], CS[1])
    EZ = expand_mat(FS[2], CS[2])

    def up_matmul(c):
        # z: (X, Y, Z) @ (Z, 2Z) -> (X, Y, 2Z); y: contract dim 1; x: repeat
        o = jnp.einsum("xyz,zw->xyw", c, EZ)
        o = jnp.einsum("xyz,yu->xuz", o, EY)
        o = jnp.repeat(o, 2, axis=0)[: FS[0]]
        return o

    def down_matmul(f):
        o = jnp.einsum("xyz,zw->xyw", f, EZ.T)
        o = jnp.einsum("xyz,yu->xuz", o, EY.T)
        shp = (o.shape[0] // 2, 2) + o.shape[1:]
        return o.reshape(shp).sum(axis=1)[: CS[0]]

    for name, up, down in (
        ("repeat ", up_repeat, down_repeat),
        ("reshape", up_reshape, down_reshape),
        ("matmul ", up_matmul, down_matmul),
    ):
        @jax.jit
        def rep(c, up=up, down=down):
            def body(carry, _):
                return 0.5 * down(up(carry)), None
            out, _ = lax.scan(body, c, None, length=K)
            return jnp.sum(out)

        t = timed(lambda rep=rep: rep(src), reps)
        print(f"{name}: {t / K * 1e3:8.3f} ms per up+down round trip",
              flush=True)


if __name__ == "__main__":
    main()
