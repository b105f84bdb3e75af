"""Tutorial 7 — coupled distributed preconditioners.

The reference distributes its composite preconditioners over MPI
(amgcl/mpi/cpr.hpp, amgcl/mpi/schur_pressure_correction.hpp) and its
hierarchy with distributed PMIS coarsening (amgcl/mpi/coarsening/pmis.hpp).
This tutorial shows the TPU equivalents on one device mesh:

  1. the general coupled distributed AMG (any matrix, any coarsening,
     exact serial iteration counts) with PMIS aggregation;
  2. distributed CPR on a reservoir-style block system;
  3. distributed Schur pressure correction on a Stokes-style system.

Run on a virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python tutorial/07_coupled_distributed.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from amgcl_tpu.models.poisson import poisson3d
    from amgcl_tpu.models.coupled import reservoir2d, stokes2d
    from amgcl_tpu.coarsening.smoothed_aggregation import SmoothedAggregation
    from amgcl_tpu.parallel.dist_solver import DistSolver

    S = min(len(jax.devices()), 8)
    print(f"mesh: {S} device(s)")

    # --- 1. coupled distributed AMG with PMIS aggregation --------------
    n = 24
    A, rhs = poisson3d(n)
    solver = DistSolver(
        A, "cg", precond="coupled_amg",
        coarsening=SmoothedAggregation(aggregates="pmis"),
        n_shards=S, tol=1e-8, maxiter=100,
    )
    x, info = solver(rhs)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    print(f"1. coupled AMG + PMIS: iters={int(info.iters)} "
          f"rel={r/np.linalg.norm(rhs):.2e}")

    # --- 2. distributed CPR --------------------------------------------
    A2, rhs2 = reservoir2d(24)
    cpr = DistSolver(
        A2, "bicgstab", precond="cpr", cpr_block_size=2,
        n_shards=S, tol=1e-8, maxiter=200,
    )
    x2, i2 = cpr(rhs2)
    r2 = np.linalg.norm(rhs2 - A2 @ np.asarray(x2, np.float64))
    print(f"2. distributed CPR:    iters={int(i2.iters)} "
          f"rel={r2/np.linalg.norm(rhs2):.2e}")

    # --- 3. distributed Schur pressure correction ----------------------
    A3, rhs3, pmask = stokes2d(12)
    schur = DistSolver(
        A3, "fgmres", precond="schur", pmask=pmask,
        n_shards=min(S, 4), tol=1e-8, maxiter=200,
    )
    x3, i3 = schur(rhs3)
    r3 = np.linalg.norm(rhs3 - A3 @ np.asarray(x3, np.float64))
    print(f"3. distributed Schur:  iters={int(i3.iters)} "
          f"rel={r3/np.linalg.norm(rhs3):.2e}")


if __name__ == "__main__":
    main()
