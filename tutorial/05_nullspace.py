"""Tutorial 5 — near-nullspace vectors / rigid body modes (mirror of the
reference tutorial 5.Nullspace): on elasticity, supplying the rigid body
modes to smoothed aggregation dramatically improves convergence.
"""

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=40)
    args = ap.parse_args()

    from amgcl_tpu import make_solver
    from amgcl_tpu.models.elasticity import elasticity2d
    from amgcl_tpu.coarsening import SmoothedAggregation
    from amgcl_tpu.coarsening.rigid_body_modes import rigid_body_modes
    from amgcl_tpu.precond.amg import AMGParams

    A, rhs, coords = elasticity2d(args.grid)
    print(f"elasticity: {A.shape[0]} dof, {A.nnz} nnz\n")

    for name, nullspace in [
        ("SA without nullspace", None),
        ("SA + rigid body modes", rigid_body_modes(2, coords)),
    ]:
        t0 = time.time()
        S = make_solver(
            A, solver="cg", tol=1e-8, maxiter=1000, block=2,
            coarsening=SmoothedAggregation(block_size=2, nullspace=nullspace),
            amg_params=AMGParams(coarse_enough=100),
        )
        x, info = S(rhs)
        r = rhs - A @ np.asarray(x, dtype=np.float64)
        print(f"{name}: iters {int(info.iters)} "
              f"error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e} "
              f"({time.time()-t0:.2f}s)")


if __name__ == "__main__":
    sys.exit(main())
