"""CPU experiment: iteration counts for the poisson3Db-class FEM problem
across solver/precond configs, vs the reference's 24 BiCGStab iters
(docs/tutorial/poisson3Db.rst).  Convergence math is backend-independent,
so CPU results transfer to chip.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from amgcl_tpu.models.unstructured import fem_poisson_3d
from amgcl_tpu import make_solver
from amgcl_tpu.coarsening.smoothed_aggregation import SmoothedAggregation
from amgcl_tpu import relaxation as rlx


def main():
    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    t0 = time.time()
    A, rhs = fem_poisson_3d(npoints)
    A = sp.csr_matrix(A)
    perm = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    A = A[perm][:, perm].tocsr()
    A.sort_indices()
    rhs = rhs[perm]
    print(f"n={A.shape[0]} nnz={A.nnz} gen={time.time()-t0:.1f}s")

    configs = [
        ("bicgstab_default", dict(solver="bicgstab", tol=1e-8, maxiter=100)),
        ("cg_default", dict(solver="cg", tol=1e-8, maxiter=200)),
        ("bicgstab_sr", dict(
            solver="bicgstab", tol=1e-8, maxiter=100,
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
        ("cg_sr", dict(
            solver="cg", tol=1e-8, maxiter=200,
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
        ("cg_sr_ilu0", dict(
            solver="cg", tol=1e-8, maxiter=200,
            relaxation=rlx.ILU0(),
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
        ("cg_eps0", dict(
            solver="cg", tol=1e-8, maxiter=200,
            coarsening=SmoothedAggregation(eps_strong=0.0),
        )),
        ("bicgstab_sr_ilu0", dict(
            solver="bicgstab", tol=1e-8, maxiter=100,
            relaxation=rlx.ILU0(),
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
        ("cg_sr_ilu0_j1", dict(
            solver="cg", tol=1e-8, maxiter=200,
            relaxation=rlx.ILU0(jacobi_iters=1),
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
        ("cg_sr_cheb4", dict(
            solver="cg", tol=1e-8, maxiter=200,
            relaxation=rlx.Chebyshev(degree=4),
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
        ("cg_sr_cheb2", dict(
            solver="cg", tol=1e-8, maxiter=200,
            relaxation=rlx.Chebyshev(degree=2),
            coarsening=SmoothedAggregation(
                estimate_spectral_radius=True, power_iters=5),
        )),
    ]
    for label, kw in configs:
        t0 = time.time()
        try:
            S = make_solver(A, **kw)
            x, info = S(rhs)
            it = int(info.iters)
            rel = float(np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
                        / np.linalg.norm(rhs))
            nlev = len(S.precond.levels)
            print(f"{label:24s} iters={it:4d} rel={rel:.2e} "
                  f"levels={nlev} t={time.time()-t0:.1f}s")
        except Exception as e:
            print(f"{label:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
