"""Tutorial 3 — coupled block system + CPR (mirror of the reference
tutorials 3.CoupCons3D and the reservoir CPR examples: scalar AMG fails or
crawls on strongly coupled block systems; block values / CPR fix it —
reference: CoupCons3D scalar diverges at 100 iters, block 4x4 converges in
47, docs/tutorial/CoupCons3D.rst).
"""

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=32)
    args = ap.parse_args()

    from amgcl_tpu import make_solver
    from amgcl_tpu.models.coupled import reservoir2d
    from amgcl_tpu.precond import CPR

    A, rhs = reservoir2d(args.grid)
    print(f"coupled system: {A.shape[0]} dof (block 2), {A.nnz} nnz\n")

    t0 = time.time()
    S1 = make_solver(A, solver="bicgstab", precond="relaxation",
                     tol=1e-8, maxiter=300)
    x, i1 = S1(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    print(f"global smoother only: iters {int(i1.iters)} "
          f"error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e} "
          f"({time.time()-t0:.2f}s)")

    t0 = time.time()
    S2 = make_solver(A, solver="bicgstab", precond=CPR(A, block_size=2),
                     tol=1e-8, maxiter=300)
    x, i2 = S2(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    print(f"CPR two-stage: iters {int(i2.iters)} "
          f"error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e} "
          f"({time.time()-t0:.2f}s)")


if __name__ == "__main__":
    sys.exit(main())
