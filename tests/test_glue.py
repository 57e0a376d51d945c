"""Equality of the three cross-level glue lowerings of the Pallas apply.

The apply's cross-level views/adjoints have three interchangeable lowerings
(AVS_PALLAS_GLUE): the logical-shape round trip ("old"), the
canonical-to-canonical reshape interleave ("c2c"), and the MXU-matmul form
("mm").  Their contract (matching real usage in make_pallas_operator):
inputs are window-supported (canonical embeddings are zero outside the
logical window — kernel zp/zc outputs are zero there because every
coefficient mask reads OUTSIDE kinds in the slack), and consumers mask
reads/adds by the receiving grid's window (kind planes / active masks).
Under that contract all three must agree on the window, with the c2c/mm
views free to carry values into the slack the consumers never read.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adaptiveviscositysolver_tpu.ops import pallas_apply as pa
from adaptiveviscositysolver_tpu.ops.arrayops import (
    face_child_sum,
    face_child_sum_adjoint,
    face_shape,
    upread,
    upread_adjoint,
)


CASES = [
    # (fine res, bbox_f, bbox_c): odd extents; a cropped-window pair whose
    # coarse-window children lie inside the fine window (probe windows
    # satisfy this: a level's occupied box covers its UP descendants)
    pytest.param((20, 12, 18), None, None, marks=pytest.mark.smoke),
    ((24, 16, 16), ((0, 20), (0, 16), (2, 14)), ((2, 10), (0, 8), (2, 6))),
]


@pytest.mark.parametrize("resf,bbf,bbc", CASES)
@pytest.mark.parametrize("f", [0, 1, 2])
def test_glue_variants_agree(resf, bbf, bbc, f):
    resc = tuple(r // 2 for r in resf)
    cf = pa.make_canon(resf, 2, bbf)
    cc = pa.make_canon(resc, 2, bbc)
    rng = np.random.default_rng(3 + f)
    fsf, fsc = face_shape(resf, f), face_shape(resc, f)
    winf = pa.embed(jnp.ones(fsf, jnp.float32), cf, 0.0)
    winc = pa.embed(jnp.ones(fsc, jnp.float32), cc, 0.0)
    # window-supported inputs (the real invariant of the CG iterate and of
    # the kernels' zp/zc outputs)
    uc = jnp.asarray(rng.normal(size=cc.shape), jnp.float32) * winc
    uf = jnp.asarray(rng.normal(size=cf.shape), jnp.float32) * winf

    def eq(got, want, exact=None):
        # fp32 summation order differs across lowerings (reshape-sum vs
        # pairwise vs MXU accumulate): allclose, not bitwise
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    # ---- up view (consumers mask by fine-window kind planes)
    old = pa.embed(upread(pa.crop(uc, cc, fsc), fsf), cf, 0.0)
    eq(pa.up_view_c2c(uc, cc, cf) * winf, old * winf)
    eq(pa.up_view_mm(uc, cc, cf) * winf, old * winf)

    # ---- up adjoint (added under the coarse active mask)
    old = pa.embed(upread_adjoint(pa.crop(uf, cf, fsf), fsc), cc, 0.0)
    eq(pa.up_adjoint_c2c(uf, cf, cc) * winc, old * winc)
    eq(pa.up_adjoint_mm(uf, cf, cc) * winc, old * winc)

    # ---- child sum view (consumed under coarse kind masks)
    old = pa.embed(face_child_sum(pa.crop(uf, cf, fsf), f, fsc), cc, 0.0)
    eq(pa.cs_view_c2c(uf, cf, cc, f) * winc, old * winc)
    eq(pa.cs_view_mm(uf, cf, cc, f) * winc, old * winc)

    # ---- child sum adjoint (added under the fine active mask)
    old = pa.embed(
        face_child_sum_adjoint(pa.crop(uc, cc, fsc), f, fsf), cf, 0.0)
    eq(pa.cs_adjoint_c2c(uc, cc, cf, f) * winf, old * winf)
    eq(pa.cs_adjoint_mm(uc, cc, cf, f) * winf, old * winf)
