"""CPU experiment: iteration counts for the Serena-class block-3
elasticity stand-in across hierarchy configs, vs the ORACLE — the actual
reference (amgcl, header-only C++) run on the SAME matrix with its
winning Serena config (CG + SA block3 + SPAI0, Serena.rst:230-262).

Measured oracle results on the stand-in (fem_elasticity_3d, RCM order):
    90k dof / 4.40M nnz:  312 iters to 1e-8   (ref's real Serena: 162)
so the stand-in is intrinsically harder than Serena itself; parity targets
must be against the oracle-on-this-matrix, not the published number.

Convergence math is backend-independent; CPU results transfer to chip.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp

from amgcl_tpu.models.unstructured import fem_elasticity_3d
from amgcl_tpu import make_block_solver
from amgcl_tpu.coarsening.smoothed_aggregation import SmoothedAggregation
from amgcl_tpu.coarsening.smoothed_aggr_emin import SmoothedAggrEMin
from amgcl_tpu.coarsening import rigid_body_modes
from amgcl_tpu import relaxation as rlx


def main():
    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    only = sys.argv[2] if len(sys.argv) > 2 else None
    t0 = time.time()
    A, rhs, coords = fem_elasticity_3d(npoints)
    A = sp.csr_matrix(A)
    B = sp.bsr_matrix(A, blocksize=(3, 3))
    pat = sp.csr_matrix(
        (np.ones(len(B.indices), np.float32), B.indices, B.indptr)
    )
    p = sp.csgraph.reverse_cuthill_mckee(pat, symmetric_mode=True)
    ps = (p[:, None] * 3 + np.arange(3)[None, :]).ravel()
    A = A[ps][:, ps].tocsr()
    A.sort_indices()
    rhs = rhs[ps]
    coords = coords[p]
    print(f"n={A.shape[0]} nnz={A.nnz} gen={time.time()-t0:.1f}s",
          flush=True)

    rbm = rigid_body_modes(3, coords)

    def SA(**kw):
        kw.setdefault("block_size", 3)
        return SmoothedAggregation(**kw)

    configs = [
        # current bench config (r04: 700 applications at 1M dof)
        ("refine_rbm_spai0", dict(
            solver="refine", tol=1e-8, maxiter=25, inner="cg",
            inner_tol=1e-4, inner_maxiter=100,
            coarsening=SA(nullspace=rbm))),
        # straight mixed-precision CG (the reference's architecture:
        # f64 Krylov + f32 hierarchy) — no defect-correction restarts
        ("cg_rbm_spai0", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SA(nullspace=rbm))),
        ("cg_plain_spai0", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SA())),
        ("cg_rbm_cheb2", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            relaxation=rlx.Chebyshev(degree=2),
            coarsening=SA(nullspace=rbm))),
        ("cg_rbm_cheb3", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            relaxation=rlx.Chebyshev(degree=3),
            coarsening=SA(nullspace=rbm))),
        ("cg_rbm_cheb4_sr", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            relaxation=rlx.Chebyshev(degree=4),
            coarsening=SA(nullspace=rbm, estimate_spectral_radius=True,
                          power_iters=5))),
        ("cg_rbm_ilu0", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            relaxation=rlx.ILU0(),
            coarsening=SA(nullspace=rbm))),
        ("cg_rbm_spai0_sr", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SA(nullspace=rbm, estimate_spectral_radius=True,
                          power_iters=5))),
        ("cg_rbm_eps04", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SA(nullspace=rbm, eps_strong=0.04))),
        ("cg_rbm_eps16", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SA(nullspace=rbm, eps_strong=0.16))),
        ("cg_rbm_emin", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SmoothedAggrEMin(nullspace=rbm, block_size=3))),
        ("cg_emin_plain", dict(
            solver="cg", tol=1e-8, maxiter=1000,
            coarsening=SmoothedAggrEMin(block_size=3))),
    ]
    for label, kw in configs:
        if only and only not in label:
            continue
        t0 = time.time()
        try:
            S = make_block_solver(A, block=3, **kw)
            setup_s = time.time() - t0
            t0 = time.time()
            x, info = S(rhs)
            iters = int(info.iters)
            solve_s = time.time() - t0
            rel = float(np.linalg.norm(
                rhs - A @ np.asarray(x, np.float64)
            )) / float(np.linalg.norm(rhs))
            nlv = len(S.precond.levels)
            opc = sum(l.A.nnz for l in S.precond.levels) / A.nnz
            print(f"{label:22s} iters={iters:4d} rel={rel:.1e} "
                  f"levels={nlv} opc={opc:.2f} "
                  f"setup={setup_s:.1f}s solve={solve_s:.1f}s", flush=True)
        except Exception as e:
            print(f"{label:22s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
