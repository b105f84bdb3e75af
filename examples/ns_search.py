"""Nullspace search (reference: examples/ns_search.cpp — cg with
ns_search=true iterates toward a nullspace vector when rhs == 0).

Build a singular matrix (Neumann-like Poisson) and recover its
near-nullspace direction from a random initial guess with a zero rhs.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import scipy.sparse as sp


def main():
    from amgcl_tpu import make_solver
    from amgcl_tpu.models.poisson import poisson2d

    # Neumann Poisson: subtract the row sums so rows sum to zero — the
    # constant vector becomes the nullspace.
    A, _ = poisson2d(24)
    A = sp.csr_matrix(A)
    A = A - sp.diags(np.asarray(A.sum(axis=1)).ravel())
    A = sp.csr_matrix(A + 1e-10 * sp.eye(A.shape[0]))  # keep AMG happy

    n = A.shape[0]
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(n)

    S = make_solver(A, solver="cg", precond="relaxation", tol=1e-6,
                    maxiter=500, ns_search=True)
    x, info = S(np.zeros(n), x0)
    x = np.asarray(x, np.float64)
    # the result should align with the constant vector
    c = x / np.linalg.norm(x)
    align = abs(c.sum()) / np.sqrt(n)
    print(f"iters={int(info.iters)}  |<x, 1>|/(|x||1|) = {align:.4f}")


if __name__ == "__main__":
    main()
