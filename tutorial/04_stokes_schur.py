"""Tutorial 4 — Stokes with Schur pressure correction (mirror of the
reference tutorial 4.Stokes, docs/tutorial/Stokes.rst: monolithic AMG needs
270 iterations; the Schur pressure correction gets 35).
"""

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=24)
    args = ap.parse_args()

    from amgcl_tpu import make_solver
    from amgcl_tpu.models.coupled import stokes2d
    from amgcl_tpu.precond import SchurPressureCorrection

    A, rhs, pmask = stokes2d(args.grid)
    print(f"matrix: {A.shape[0]} dof ({int(pmask.sum())} pressure), "
          f"{A.nnz} nnz\n")

    # 1. monolithic: single AMG on the saddle-point matrix (struggles)
    t0 = time.time()
    S1 = make_solver(A, solver="fgmres", precond="relaxation",
                     tol=1e-8, maxiter=500)
    x, i1 = S1(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    print(f"single-level smoother: iters {int(i1.iters)} "
          f"error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e} "
          f"({time.time()-t0:.2f}s)")

    # 2. Schur pressure correction
    t0 = time.time()
    P = SchurPressureCorrection(A, pmask, approx_schur=True)
    S2 = make_solver(A, solver="fgmres", precond=P, tol=1e-8, maxiter=200)
    x, i2 = S2(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    print(f"Schur pressure correction: iters {int(i2.iters)} "
          f"error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e} "
          f"({time.time()-t0:.2f}s)")


if __name__ == "__main__":
    sys.exit(main())
