"""Tutorial 8: unstructured FEM Poisson — the poisson3Db class.

The reference's first tutorial (docs/tutorial/poisson3Db.rst) solves an
85,623-dof / 2.37M-nnz unstructured FEM Poisson system with
BiCGStab + smoothed aggregation + SPAI0 to 1e-8 (24 iterations;
0.592 s CPU / 0.171 s CUDA solve).  The MatrixMarket file is not
available offline, so this tutorial runs the same configuration on an
honest same-class stand-in: P1 finite elements on a Delaunay
tetrahedralization of 150k jittered points (2.46M nnz), rows in
shuffled mesh order.

Pipeline mirrors the reference CLI workflow:
  1. Cuthill–McKee reorder at ingest (adapter capability; on TPU the
     SELL gather kernel wants clustered columns),
  2. AMG(SA + SPAI0) preconditioner,
  3. mixed-precision defect correction to a true f64 1e-8 residual.

Run: python tutorial/08_unstructured_fem.py [npoints]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from amgcl_tpu.utils.hostmem import ensure_fast_heap

    ensure_fast_heap()

    import numpy as np
    import scipy.sparse as sp

    from amgcl_tpu import make_solver
    from amgcl_tpu.models.unstructured import fem_poisson_3d

    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    A, rhs = fem_poisson_3d(npoints)
    A = sp.csr_matrix(A)
    print(f"unstructured FEM Poisson: {A.shape[0]} dof, {A.nnz} nnz "
          f"(poisson3Db: 85,623 dof, 2,374,949 nnz)")

    perm = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    A = A[perm][:, perm].tocsr()
    A.sort_indices()
    rhs = rhs[perm]

    t0 = time.time()
    S = make_solver(A, solver="refine", tol=1e-8, maxiter=25,
                    inner="cg", inner_tol=1e-4, inner_maxiter=60)
    print(f"setup: {time.time()-t0:.1f}s  "
          f"(L0 format: {type(S.precond.levels[0].A).__name__})")

    t0 = time.time()
    x, info = S(rhs)
    iters = int(info.iters)
    solve_s = time.time() - t0
    rel = float(np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
                / np.linalg.norm(rhs))
    print(f"iterations: {iters}   solve: {solve_s:.2f}s   "
          f"true rel residual: {rel:.2e}")
    print("(reference poisson3Db: 24 BiCGStab iters, err 8.34e-9, "
          "solve 0.592s CPU / 0.171s CUDA)")
    assert rel < 1e-8


if __name__ == "__main__":
    main()
