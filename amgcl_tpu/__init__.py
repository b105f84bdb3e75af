"""amgcl_tpu — a TPU-native algebraic multigrid framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of AMGCL
(ddemidov/amgcl): algebraic multigrid preconditioning with a full Krylov
solver suite, block (BSR) value types, mixed precision, composite
preconditioners, and SPMD distribution over TPU device meshes.

Unlike the reference — which builds the hierarchy on the CPU and offloads
only the solve phase to a backend (reference: amgcl/amg.hpp:355-360) — this
framework keeps the solve phase entirely on-device as one jitted function
(Krylov loop + multigrid cycle), uses static-shape ELLPACK block storage for
TPU lane friendliness, and distributes via `jax.sharding`/`shard_map` with
ICI collectives instead of MPI.

Double precision is a first-class capability of the reference (all tutorial
baselines solve to 1e-8 relative residual), so importing this package enables
jax x64 support. The performance-critical path (the AMG hierarchy) defaults
to float32; only the outer Krylov vectors use float64 — the same mixed
precision strategy as the reference's examples/mixed_precision.cpp.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from . import ops, coarsening, relaxation, solver, precond, parallel, models, utils
from .ops.formats import SparseMatrix, DiaMatrix, BlockDiaMatrix
from .precond.amg import AMG
from .precond.as_preconditioner import AsPreconditioner
from .precond.dummy import DummyPrecond
from .api import make_solver, make_block_solver
from .runtime import make_solver_from_config

__version__ = "0.1.0"

__all__ = [
    "SparseMatrix",
    "DiaMatrix",
    "BlockDiaMatrix",
    "make_block_solver",
    "AMG",
    "AsPreconditioner",
    "DummyPrecond",
    "make_solver",
    "make_solver_from_config",
    "ops",
    "coarsening",
    "relaxation",
    "solver",
    "precond",
    "parallel",
    "models",
    "utils",
]
