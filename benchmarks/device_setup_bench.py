"""On-chip measurement of the device-general AMG setup (PMIS + sort-RAP
entirely on device) at poisson3Db-class scale and above.

Reference comparison: the reference builds its hierarchy on the CPU in
0.136 s for poisson3Db (85k dof; docs/tutorial/poisson3Db.rst:37-63) and
1.33 s for the 150^3 Poisson on CUDA (smem_data/poisson/amgcl-cuda.txt).
Here the general setup never touches the host after upload: strength,
PMIS aggregation, smoothed P, AP/RAP sort-contractions and SPAI0 states
are all jitted device programs (precond/ell_setup.py,
coarsening/device_setup.py).

Usage: python benchmarks/device_setup_bench.py [npoints]
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
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_amgcl")

    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 370_000

    from amgcl_tpu.models.unstructured import fem_poisson_3d
    from amgcl_tpu import make_solver

    t0 = time.time()
    A, rhs = fem_poisson_3d(npoints)
    A = sp.csr_matrix(A)
    perm = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    A = A[perm][:, perm].tocsr()
    A.sort_indices()
    rhs = rhs[perm]
    print(f"# n={A.shape[0]} nnz={A.nnz} generate={time.time()-t0:.1f}s",
          file=sys.stderr)

    # cold setup (compiles included), then a warm re-setup with the same
    # shapes to separate compile cost from execution
    for tag in ("cold", "warm"):
        t0 = time.time()
        S = make_solver(A, solver="refine", tol=1e-8, maxiter=25,
                        inner="cg", inner_tol=1e-4, inner_maxiter=60,
                        device_setup=True)
        stats = getattr(S.precond, "setup_stats", {})
        setup_s = time.time() - t0
        print(f"# {tag} device setup: {setup_s:.1f}s phases="
              f"{ {k: round(v, 2) for k, v in stats.get('phase_s', {}).items()} }"
              f" retries={stats.get('retries')}", file=sys.stderr)

    x, info = S(rhs)
    iters = int(info.iters)
    t0 = time.time()
    x, info = S(rhs)
    _ = int(info.iters)
    solve_s = time.time() - t0
    rel = float(np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
                / np.linalg.norm(rhs))
    print(json.dumps({
        "metric": f"device_general_setup_{A.shape[0]}dof_setup",
        "value": round(setup_s, 2),
        "unit": "seconds",
        "vs_baseline": round(0.136 * (A.shape[0] / 85623) / setup_s, 3),
    }))
    print(f"# solve={solve_s:.3f}s iters={iters} rel={rel:.2e}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
