"""Block-system benchmark — the role of the reference's Serena tutorial
measurements (docs/tutorial/Serena.rst: scalar vs block values vs mixed
precision on a 3x3-block elasticity-class matrix).

Compares, on a block-3 grid problem:
  * scalar solve (block structure ignored),
  * block solve via block-ELL (gathers),
  * block solve via block-DIA (gather-free — the auto-selected path),
  * mixed-precision refinement on top.

Usage: python benchmarks/block_bench.py [n]   (problem is n^3 * 3 dof)
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
    from amgcl_tpu.models.poisson import poisson3d_block
    from amgcl_tpu import make_solver
    from amgcl_tpu.api import make_block_solver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    A, rhs = poisson3d_block(n, block=3)
    print(f"# block-3 grid problem: {A.shape[0]} dof, {A.nnz} nnz")

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
        print(f"{label:28s} iters={it:3d} solve={min(ts):.4f}s "
              f"rel={rel:.1e} setup={setup:.1f}s")

    run("scalar (block ignored)",
        lambda: make_solver(A, solver="cg", tol=1e-8, maxiter=300))
    run("block-ELL (forced gathers)",
        lambda: make_solver(A, solver="cg", tol=1e-8, maxiter=300, block=3,
                            matrix_format="ell"))
    run("block-DIA (auto)",
        lambda: make_block_solver(A, block=3, solver="cg", tol=1e-8,
                                  maxiter=300))
    run("block-DIA + refine (mixed)",
        lambda: make_block_solver(A, block=3, solver="refine", tol=1e-8,
                                  maxiter=25, inner="cg", inner_tol=1e-4,
                                  inner_maxiter=60))


if __name__ == "__main__":
    main()
