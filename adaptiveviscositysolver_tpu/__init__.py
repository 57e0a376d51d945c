"""TPU-native adaptive octree viscosity solver.

A from-scratch JAX/XLA reimplementation of the capabilities of
rgoldade/AdaptiveViscositySolver (SIGGRAPH 2019, "An Adaptive Variational
Finite Difference Framework for Efficient Symmetric Octree Viscosity"):
per-frame, given liquid/solid SDFs, a staggered MAC velocity, solid
velocity, viscosity and density fields, it builds a 2:1 face-graded octree
over the free-surface/solid band, assembles the symmetric variational
viscosity system matrix-free on a dense level-major pyramid, solves it with
Jacobi-preconditioned CG, and writes the solution back to the uniform grid
with T-junction-consistent interpolation.

Everything is a single jitted XLA program with static shapes (octree
topology is data, not shape), shardable over a ``jax.sharding.Mesh`` for
multi-chip scale-out.
"""

from .config import SolverConfig
from .solver import FluidState, SolveResult, SolveStats, make_solver, solve_viscosity

__all__ = [
    "SolverConfig",
    "FluidState",
    "SolveResult",
    "SolveStats",
    "make_solver",
    "solve_viscosity",
]

__version__ = "0.1.0"
