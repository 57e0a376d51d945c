"""Solver configuration.

TPU-native analog of the reference's two config layers:

* the DOP parameter sheet (runtime knobs) — see
  /root/reference/Source/HDK_AdaptiveViscosity.cpp:36-124 for the parameter
  names and defaults mirrored here, and
* the build-time precision switch ``USESINGLEPRECISION`` / ``USEEIGEN``
  (/root/reference/Source/HDK_Utilities.h:25-43) — here a dtype field.

All knobs that change numerics are preserved so that a solve can be configured
for parity with the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static configuration for one adaptive viscosity solve.

    Everything here is a *static* (trace-time) value: changing any field
    recompiles the jitted pipeline.  Per-frame data (fields, dt) are runtime
    arguments of :func:`adaptiveviscositysolver_tpu.solver.solve_viscosity`.
    """

    # Octree shape knobs (reference defaults: octreeLevels=4, fineLayerBandwidth=2;
    # HDK_AdaptiveViscosity.cpp:106-107).
    octree_levels: int = 4
    fine_bandwidth: int = 2

    # Free-surface / solid-boundary treatment (defaults at cpp:69,104,93).
    extrapolation: float = 0.5          # in units of dx
    num_supersamples: int = 3           # volume-fraction samples per axis
    apply_solid_weights: bool = False

    # Discretization toggle (cpp:109; default on).
    use_enhanced_gradients: bool = True

    # The reference samples the *edge-axis* component of the solid velocity
    # for solid-boundary faces in the shear-stress RHS (cpp:1901), although
    # the replaced face carries the face-axis component.  False (default)
    # uses the physically consistent face-axis component; True replicates
    # the reference bit-for-bit.
    compat_edge_boundary_component: bool = False

    # CG solve (cpp:62-66).
    tolerance: float = 1e-3
    max_iterations: int = 2500

    # Preconditioner strength: 1 = Jacobi (the reference's Eigen default,
    # cpp:611-631); k > 1 = fixed degree-k Chebyshev polynomial in the
    # Jacobi-scaled operator (operator.make_chebyshev_precond) — same
    # true-residual stopping rule, ~k-fold fewer synchronized CG iterations
    # at k extra matvecs each, which amortizes the per-iteration launch/dot
    # overhead that dominates small solves.  Applies to the single-device
    # flat CG paths; ignored under iterative refinement.  Must be ODD when
    # > 1: even-degree Chebyshev polynomials go indefinite on eigenvalues
    # above the (lower-bound) power-iteration lam_max estimate — measured
    # to stall CG — so rather than silently running degree+1 applies (and
    # breaking the "cheb_degree + 1 operator applies per outer iteration"
    # cost model) an even value is rejected here.
    cheb_degree: int = 1

    # Cooperative cancellation (the reference polls boss->opInterrupt() in
    # every loop, e.g. HDK_OctreeGrid.cpp:227-228; a jitted solve cannot be
    # interrupted from outside, so the CG while_loop — the dominant cost —
    # polls the process-global flag in utils/cancel.py via a host
    # io_callback every this-many iterations and exits early when set,
    # returning the partial iterate).  0 (default) = never poll: each poll
    # is a host round trip, so only interactive hosts should enable it.
    # Applies to the single-device flat-CG paths (pallas / v1 / v1-fused).
    cancel_poll_iters: int = 0

    # Precision of the solve (HDK_Utilities.h:25-37): None inherits the
    # input fields' dtype (fp32 from the scene builders — the TPU-native
    # choice; fp64 in the oracle parity tests); set explicitly to force a
    # cast at solve entry.
    dtype: jnp.dtype | None = None

    # Matvec implementation (identical numerics, different HBM behavior):
    #   "auto"     — "pallas" on a TPU backend, "v1-fused" elsewhere
    #   "pallas"   — fused per-level Pallas TPU kernels (ops/pallas_apply.py):
    #                coefficients and taus live in VMEM registers only.
    #                float32-only: a float64 solve with explicit "pallas"
    #                raises unless use_iterative_refinement recovers the
    #                precision ("auto" falls back to "v1-fused" for float64)
    #   "v1"       — whole-array XLA apply with materialized coefficients
    #   "v1-fused" — v1 with coefficients rebuilt inside the CG loop
    apply_impl: str = "auto"

    # Mixed-precision solve (the TPU-native reading of USESINGLEPRECISION,
    # HDK_Utilities.h:25-37): run the CG inner loop in float32 and recover
    # full input-precision accuracy with an iterative-refinement outer loop
    # that re-forms the residual in the input dtype (BASELINE.md target:
    # "the Eigen-CG residual trajectory is reproduced by fp32 Jacobi-CG with
    # iterative refinement").  Meaningful when the inputs are float64.
    use_iterative_refinement: bool = False

    @property
    def fused_apply(self) -> bool:
        return self.apply_impl.endswith("-fused")

    def __post_init__(self):
        if self.octree_levels < 1:
            raise ValueError("octree_levels must be >= 1")
        if self.num_supersamples < 1:
            raise ValueError("num_supersamples must be >= 1")
        if self.cheb_degree < 1:
            raise ValueError("cheb_degree must be >= 1")
        if self.cancel_poll_iters < 0:
            raise ValueError("cancel_poll_iters must be >= 0")
        if self.cheb_degree > 1 and self.cheb_degree % 2 == 0:
            raise ValueError(
                "cheb_degree must be odd: even-degree Chebyshev is "
                "indefinite on eigenvalues above the estimated lam_max "
                f"(got {self.cheb_degree}; use {self.cheb_degree + 1})"
            )
        allowed = {"auto", "pallas", "v1", "v1-fused"}
        if self.apply_impl not in allowed:
            raise ValueError(f"apply_impl must be one of {sorted(allowed)}")


def capped_levels(shape: Tuple[int, int, int], desired_levels: int) -> int:
    """Cap the level count like HDK_OctreeGrid::init (HDK_OctreeGrid.cpp:27-40).

    The reference pads the domain to the next power of two and then caps the
    number of levels at log2 of the smallest padded axis.
    """
    import math

    levels = desired_levels
    for n in shape:
        padded = 1 << max(0, math.ceil(math.log2(n)) if n > 1 else 0)
        levels = min(levels, max(1, int(math.log2(padded))))
    return levels
