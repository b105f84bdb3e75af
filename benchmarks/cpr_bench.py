"""Reservoir (CPR) benchmark — the role of the reference's CPR examples
(examples/cpr.cpp; tutorial 3 block-system story): global smoother alone
vs two-stage CPR on a block-2 reservoir-like system, single chip.

Usage: python benchmarks/cpr_bench.py [n]   (problem is n^2 * 2 dof)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_amgcl")
    import jax.numpy as jnp
    from amgcl_tpu.models.coupled import reservoir2d
    from amgcl_tpu.precond.cpr import CPR
    from amgcl_tpu import make_solver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    A, rhs = reservoir2d(n)
    print(f"# reservoir2d({n}): {A.shape[0]} dof, {A.nnz} nnz (block 2)")

    def run(label, build):
        t0 = time.time()
        S = build()
        setup = time.time() - t0
        rj = jnp.asarray(rhs)
        x0 = jnp.zeros_like(rj)
        x, info = S._compiled(rj, x0)
        it = int(info.iters)
        ts = []
        for _ in range(3):
            t0 = time.time()
            x, info = S._compiled(rj, x0)
            _ = int(info.iters)
            ts.append(time.time() - t0)
        r = rhs - A @ np.asarray(x, dtype=np.float64)
        rel = np.linalg.norm(r) / np.linalg.norm(rhs)
        print(f"{label:24s} iters={it:4d} solve={min(ts):.4f}s "
              f"rel={rel:.1e} setup={setup:.1f}s")

    run("bicgstab + relaxation",
        lambda: make_solver(A, solver="bicgstab", precond="relaxation",
                            tol=1e-8, maxiter=500))
    run("bicgstab + CPR",
        lambda: make_solver(A, solver="bicgstab", tol=1e-8, maxiter=200,
                            precond=CPR(A, block_size=2)))


if __name__ == "__main__":
    main()
