"""Deflated solve (reference: examples/deflated_solver.cpp /
deflated_solver.hpp): projected CG with user deflation vectors."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from amgcl_tpu import make_solver
    from amgcl_tpu.precond.deflation import DeflatedSolver, constant_deflation
    from amgcl_tpu.models.poisson import poisson3d

    A, rhs = poisson3d(16)
    Z = constant_deflation(A.shape[0], nparts=8)
    S = DeflatedSolver(A, Z, solver="cg", tol=1e-8, maxiter=200)
    x, info = S(rhs)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    print(f"iters={int(info.iters)} rel={r/np.linalg.norm(rhs):.2e}")


if __name__ == "__main__":
    main()
