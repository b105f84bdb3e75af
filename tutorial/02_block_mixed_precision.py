"""Tutorial 2 — block values + mixed precision (mirror of the reference
tutorial 2.Serena, docs/tutorial/Serena.rst).

The reference's Serena matrix (1.39M dof, 3×3 blocks) shows two levers:
block value types (BSR) and a float32 preconditioner under a float64
solver (solve time 112 s → 29.4 s in the reference).  This script
demonstrates both on a generated block problem, or the real matrix via
``-A``.
"""

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-A", "--matrix")
    ap.add_argument("-b", "--block", type=int, default=3)
    ap.add_argument("--grid", type=int, default=24)
    args = ap.parse_args()

    from amgcl_tpu import make_solver
    from amgcl_tpu.api import make_block_solver

    if args.matrix:
        from amgcl_tpu.utils.io import mm_read

        A = mm_read(args.matrix)
        rhs = np.ones(A.shape[0])
    else:
        from amgcl_tpu.models.poisson import poisson3d_block

        A, rhs = poisson3d_block(args.grid, block=args.block)

    print(f"matrix: {A.shape[0]} dof, {A.nnz} nnz, block {args.block}\n")

    configs = [
        ("scalar, f64 precond + f64 solve", dict(block=1, precond_dtype=jnp.float64)),
        ("block,  f64 precond + f64 solve", dict(block=args.block, precond_dtype=jnp.float64)),
        ("block,  f32 precond + f64 solve (mixed)", dict(block=args.block)),
    ]
    for name, kw in configs:
        t0 = time.time()
        S = make_solver(A, solver="cg", tol=1e-8, maxiter=200, **kw)
        setup = time.time() - t0
        t0 = time.time()
        x, info = S(rhs)
        iters = int(info.iters)
        solve = time.time() - t0
        r = rhs - A @ np.asarray(x, dtype=np.float64)
        print(f"{name}: iters {iters} "
              f"error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e} "
              f"setup {setup:.2f}s solve {solve:.3f}s")


if __name__ == "__main__":
    sys.exit(main())
