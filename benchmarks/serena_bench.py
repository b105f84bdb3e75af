"""Serena-class benchmark: genuinely unstructured 3x3-block FEM
elasticity (reference: docs/tutorial/Serena.rst — 1,391,349 dof /
64.5M nnz gas-reservoir elasticity; matrix not available offline, so the
stand-in is P1 elasticity on a shuffled jittered-lattice Delaunay mesh,
amgcl_tpu/models/unstructured.py::fem_elasticity_3d).

Reference numbers on Serena (Serena.rst:137-143, 255-262, 414-421):
  block 3x3 f64:          120 iters, solve 70.0 s   (1 CPU node)
  block + mixed float:    162 iters, solve 29.4 s, setup 1.01 s
  VexCL GPU mixed:        err 9.75e-9, solve 6.42 s

Here: CG + AMG(pointwise SA + SPAI0) over 3x3 BSR, mixed precision via
the refine driver (f32 block-SELL inner, f64 defect outer).  On TPU the
block hierarchy rides the BlockSell windowed-gather kernel
(ops/pallas_bsell.py).

Prints one BENCH-style JSON line per configuration.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from amgcl_tpu.utils.hostmem import ensure_fast_heap

    ensure_fast_heap()

    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp

    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 340_000

    from amgcl_tpu.models.unstructured import fem_elasticity_3d
    from amgcl_tpu import make_block_solver

    t0 = time.time()
    A, rhs, coords = fem_elasticity_3d(npoints)
    A = sp.csr_matrix(A)
    gen_s = time.time() - t0

    # block-respecting bandwidth-reducing reorder (the reference CLI's
    # Cuthill-McKee on the block graph, adapter/reorder.hpp)
    t0 = time.time()
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
    rcm_s = time.time() - t0
    print(f"# n={A.shape[0]} nnz={A.nnz} generate={gen_s:.1f}s "
          f"rcm={rcm_s:.1f}s", file=sys.stderr)

    from amgcl_tpu.coarsening.smoothed_aggregation import SmoothedAggregation
    from amgcl_tpu.coarsening import rigid_body_modes

    # Config search (benchmarks/exp_serena_convergence.py, 90k dof, CPU;
    # oracle = the actual reference compiled against this same matrix
    # with its winning Serena config = 312 iters at 90k / 347 at 1M):
    #   refine + RBM + eps 0.08 (r04 bench config):   233 inner iters
    #   straight mixed CG + RBM + eps 0.08:           130
    #   straight mixed CG + RBM + eps 0.04:           113  <- winner
    # RBM near-nullspace (reference: coarsening/rigid_body_modes.hpp) +
    # a tighter strength threshold beat the oracle ~2.8x; the defect-
    # correction driver loses ~80% extra inner iterations to restarts,
    # so the Serena-class headline uses the reference's own architecture:
    # f64 Krylov (double-f32 SELL SpMV) + f32 block hierarchy.
    rbm = rigid_body_modes(3, coords)
    configs = (
        ("cg_mixed_rbm_1e-8", dict(
            solver="cg", tol=1e-8, maxiter=500,
            coarsening=SmoothedAggregation(nullspace=rbm, eps_strong=0.04, block_size=3),
        )),
        # mixed precision via defect correction (kept for comparison)
        ("refine_block_1e-8", dict(
            solver="refine", tol=1e-8, maxiter=25, inner="cg",
            inner_tol=1e-4, inner_maxiter=200,
            coarsening=SmoothedAggregation(nullspace=rbm, eps_strong=0.04, block_size=3),
        )),
    )
    import traceback

    for label, kw in configs:
        t0 = time.time()
        try:
            S = make_block_solver(A, block=3, **kw)
        except Exception:
            traceback.print_exc()
            continue
        setup_s = time.time() - t0

        try:
            x, info = S(rhs)                # warm-up & compile
        except Exception:
            traceback.print_exc()
            continue
        iters = int(info.iters)
        times = []
        for _ in range(3):
            t0 = time.time()
            x, info = S(rhs)
            _ = int(info.iters)
            times.append(time.time() - t0)
        solve_s = min(times)

        rel = float(np.linalg.norm(
            rhs - A @ np.asarray(x, np.float64)
        )) / float(np.linalg.norm(rhs))
        fmt = type(S.precond.levels[0].A).__name__

        print(json.dumps({
            "metric": f"serena_class_block3_{A.shape[0]}dof_{label}",
            "value": round(solve_s, 4),
            "unit": "seconds",
            "vs_baseline": round(29.4 / solve_s, 2),
        }))
        print(f"# {label}: iters={iters} rel={rel:.2e} setup={setup_s:.1f}s"
              f" solve={solve_s:.4f}s L0={fmt} "
              "(baseline: Serena mixed CPU solve 29.4s @ 162 iters / "
              "setup 1.01s, GPU 6.42s; oracle on THIS matrix: "
              "347 iters at 1.03M dof)", file=sys.stderr)


if __name__ == "__main__":
    main()
