"""Tutorial 1 — Poisson problem (mirror of the reference tutorial
1.poisson3Db, docs/tutorial/poisson3Db.rst).

The reference downloads the SuiteSparse matrix poisson3Db (85,623 dof);
with no network this script generates the same problem class (3D Poisson).
Pass ``-A matrix.mtx [-f rhs.mtx]`` to use the real file and reproduce the
reference numbers (24 iters for BiCGStab+SA+SPAI0 at tol 1e-8,
docs/tutorial/poisson3Db.rst:37-63).

Run: python tutorial/01_poisson.py [-A A.mtx] [--grid N]
"""

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-A", "--matrix")
    ap.add_argument("-f", "--rhs")
    ap.add_argument("--grid", type=int, default=44,
                    help="generated grid size (44^3 ≈ poisson3Db's 85k dof)")
    args = ap.parse_args()

    from amgcl_tpu import make_solver
    from amgcl_tpu.relaxation import make_smoother

    if args.matrix:
        from amgcl_tpu.utils.io import mm_read

        A = mm_read(args.matrix)
        rhs = mm_read(args.rhs) if args.rhs else np.ones(A.shape[0])
        grid_kw = {}
    else:
        from amgcl_tpu.models.poisson import poisson3d
        from amgcl_tpu.coarsening import GridAggregation

        n = args.grid
        A, rhs = poisson3d(n)
        grid_kw = dict(coarsening=GridAggregation(dims=(n, n, n)))

    print(f"matrix: {A.shape[0]} dof, {A.nnz} nnz\n")

    for name, solver, relax in [
        ("BiCGStab + SA + SPAI0 (reference: 24 iters)", "bicgstab", "spai0"),
        ("GMRES + SA + SPAI0    (reference: 39 iters)", "gmres", "spai0"),
        ("BiCGStab + SA + ILU0  (reference: 12 iters)", "bicgstab", "ilu0"),
    ]:
        t0 = time.time()
        kw = dict(grid_kw)
        if relax != "spai0" and "coarsening" in kw:
            # rebuild a fresh (stateful) coarsening per solver
            from amgcl_tpu.coarsening import GridAggregation

            n = args.grid
            kw["coarsening"] = GridAggregation(dims=(n, n, n))
        S = make_solver(
            A, solver=solver, tol=1e-8, maxiter=100,
            relaxation=make_smoother(relax), **kw,
        )
        setup = time.time() - t0
        t0 = time.time()
        x, info = S(rhs)
        iters = int(info.iters)
        solve = time.time() - t0
        r = rhs - A @ np.asarray(x, dtype=np.float64)
        rel = np.linalg.norm(r) / np.linalg.norm(rhs)
        print(f"{name}")
        print(f"  iters {iters}  error {rel:.2e}  setup {setup:.2f}s "
              f"solve {solve:.3f}s (incl. compile)\n")

    # single-level: CG + ILU0 as the whole preconditioner (rst:166-172)
    S = make_solver(A, solver="cg", precond="relaxation", tol=1e-8,
                    maxiter=100, relaxation=make_smoother("ilu0"))
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    print(f"CG + ILU0 single level (reference: 8 iters): "
          f"iters {int(info.iters)}  error "
          f"{np.linalg.norm(r)/np.linalg.norm(rhs):.2e}")


if __name__ == "__main__":
    sys.exit(main())
