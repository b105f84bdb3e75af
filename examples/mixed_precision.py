"""Mixed-precision solve (reference: examples/mixed_precision.cpp —
float preconditioner with a double solver).

Two couplings, both TPU-native:
  1. f32 hierarchy under an f64 Krylov loop (the reference's scheme);
  2. iterative refinement: the whole Krylov loop in f32, f64 defect
     correction outside (all f64 arithmetic reduced to a handful of
     SpMVs — the right trade on hardware that emulates f64).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from amgcl_tpu import make_solver
    from amgcl_tpu.models.poisson import poisson3d

    A, rhs = poisson3d(24)

    S1 = make_solver(A, solver="cg", tol=1e-8)   # f32 precond / f64 Krylov
    x1, i1 = S1(rhs)
    r1 = np.linalg.norm(rhs - A @ np.asarray(x1, np.float64))

    S2 = make_solver(A, solver="refine", tol=1e-8, inner="cg",
                     inner_tol=1e-4)             # f32 Krylov / f64 defect
    x2, i2 = S2(rhs)
    r2 = np.linalg.norm(rhs - A @ np.asarray(x2, np.float64))

    nb = np.linalg.norm(rhs)
    print(f"f64 Krylov + f32 AMG:   {int(i1.iters)} iters, rel {r1/nb:.2e}")
    print(f"f32 Krylov + f64 refine: {int(i2.iters)} inner iters, "
          f"rel {r2/nb:.2e}")


if __name__ == "__main__":
    main()
