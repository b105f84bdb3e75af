"""Custom matrix input (reference: examples/custom_adapter.cpp — adapt a
user's own matrix type).  Any object exposing ``tocsr()`` works, e.g.
the assemble-on-demand CrsBuilder (adapter::crs_builder role)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from amgcl_tpu import make_solver
    from amgcl_tpu.adapter.crs_builder import CrsBuilder

    n = 128

    def row(i):   # 1D Poisson emitted row by row
        cols, vals = [i], [2.0]
        if i > 0:
            cols.append(i - 1); vals.append(-1.0)
        if i < n - 1:
            cols.append(i + 1); vals.append(-1.0)
        return cols, vals

    S = make_solver(CrsBuilder(n, row), solver="cg", precond="relaxation",
                    tol=1e-8, maxiter=500)
    rhs = np.ones(n)
    x, info = S(rhs)
    A = CrsBuilder(n, row).tocsr()
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    print(f"iters={int(info.iters)} rel={r/np.linalg.norm(rhs):.2e}")


if __name__ == "__main__":
    main()
