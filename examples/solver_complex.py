"""Complex-valued system (reference: examples/solver_complex.cpp) via
the 2x2-real equivalent formulation (adapter/complex_adapter.py,
mirroring amgcl/adapter/complex.hpp)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import scipy.sparse as sp


def main():
    from amgcl_tpu import make_solver
    from amgcl_tpu.adapter import complex_to_real, real_to_complex
    from amgcl_tpu.models.poisson import poisson2d

    P, _ = poisson2d(20)
    A = sp.csr_matrix(P + 1j * 0.1 * sp.eye(P.shape[0]))
    rhs = np.ones(A.shape[0], dtype=np.complex128)

    Ar, br = complex_to_real(A, rhs)
    S = make_solver(Ar, solver="bicgstab", tol=1e-8, maxiter=300, block=2)
    xr, info = S(br)
    x = real_to_complex(np.asarray(xr))
    r = np.linalg.norm(rhs - A @ x) / np.linalg.norm(rhs)
    print(f"iters={int(info.iters)} rel={r:.2e}")


if __name__ == "__main__":
    main()
