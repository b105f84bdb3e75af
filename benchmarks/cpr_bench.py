"""CPR benchmark at reference-tutorial scale — the role of the
reference's CoupCons3D / reservoir CPR workflows (docs/tutorial/
CoupCons3D.rst: 416,800 dof block system, 47 iters block-4; the cpr
examples run reservoir block-2 systems).

reservoir2d(n) gives 2n² dof (pressure, saturation per cell); n = 320
is 204,800 dof (≥ the 100k-dof VERDICT bar).

Usage: python benchmarks/cpr_bench.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from amgcl_tpu.utils.hostmem import ensure_fast_heap
    ensure_fast_heap()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_amgcl")
    import jax.numpy as jnp
    import numpy as np
    from amgcl_tpu.models.coupled import reservoir2d
    from amgcl_tpu.runtime import make_solver_from_config

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    A, rhs = reservoir2d(n)
    print(f"# reservoir2d({n}): {A.shape[0]} dof, nnz={A.nnz}",
          file=sys.stderr)

    t0 = time.time()
    S = make_solver_from_config(A, {
        "solver": {"type": "bicgstab", "tol": 1e-8, "maxiter": 200},
        "precond": {"class": "cpr", "block_size": 2},
    })
    setup_s = time.time() - t0

    rj = jnp.asarray(rhs)
    x0 = jnp.zeros_like(rj)
    x, info = S._compiled(rj, x0)
    iters = int(info.iters)
    ts = []
    for _ in range(3):
        t0 = time.time()
        x, info = S._compiled(rj, x0)
        _ = int(info.iters)
        ts.append(time.time() - t0)
    solve_s = min(ts)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)

    print(json.dumps({
        "metric": f"reservoir_cpr_{A.shape[0]}dof_bicgstab_solve_to_1e-8",
        "value": round(solve_s, 4),
        "unit": "seconds",
        "vs_baseline": round(2.13 / solve_s, 2),
    }))
    print(f"# iters={iters} rel={rel:.2e} setup={setup_s:.1f}s "
          f"solve={solve_s:.4f}s "
          "(reference class: CPR reservoir solves ~2.13s mixed)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
