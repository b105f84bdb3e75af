"""Saddle-point benchmark — the role of the reference's Stokes tutorial
(docs/tutorial/Stokes.rst: monolithic AMG 270 iters / 8.60 s vs Schur
pressure correction 35 iters / 3.41 s vs mixed 2.13 s on ucube-554k).

Compares, on a synthetic Stokes-like system:
  * one-level relaxation preconditioning (the naive baseline),
  * Schur pressure correction (approx_schur + SIMPLEC diagonal),
on a single chip with honest scalar-forced timing.

Usage: python benchmarks/stokes_bench.py [n]   (velocity grid n x n)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from amgcl_tpu.utils.hostmem import ensure_fast_heap
    ensure_fast_heap()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_amgcl")
    import jax.numpy as jnp
    from amgcl_tpu.models.coupled import stokes2d
    from amgcl_tpu.precond.schur import SchurPressureCorrection
    from amgcl_tpu import make_solver

    import json

    from amgcl_tpu.models.coupled import stokes3d

    dim3 = "--3d" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if dim3:
        # reference tutorial scale: n=52 -> 562,432 dof vs ucube 554,496
        n = int(args[0]) if args else 52
        A, rhs, pmask = stokes3d(n)
        tag = f"stokes3d_{A.shape[0]}dof"
    else:
        n = int(args[0]) if args else 64
        A, rhs, pmask = stokes2d(n)
        tag = f"stokes2d_{A.shape[0]}dof"
    print(f"# {tag}: {A.shape[0]} dof ({int(pmask.sum())} pressure)")

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
        print(f"{label:26s} iters={it:4d} solve={min(ts):.4f}s "
              f"rel={rel:.1e} setup={setup:.1f}s")
        return min(ts), it, rel

    if not dim3:
        run("fgmres + relaxation",
            lambda: make_solver(A, solver="fgmres", precond="relaxation",
                                tol=1e-8, maxiter=600, M=60))
    solve_s, iters, rel = run(
        "fgmres + Schur (approx)",
        lambda: make_solver(
            A, solver="fgmres", tol=1e-8, maxiter=300,
            precond=SchurPressureCorrection(A, pmask, approx_schur=True),
        ))
    # reference: Stokes SPC 3.41 s (f64) / 2.13 s (mixed) @ 554k dof
    print(json.dumps({
        "metric": f"{tag}_fgmres_schur_solve_to_1e-8",
        "value": round(solve_s, 4),
        "unit": "seconds",
        "vs_baseline": round(3.41 / solve_s, 2),
    }))
    # The QUALITY configuration (reference iteration band: 35 iters at
    # 554k dof, Stokes.rst:121-176): exact nested usolve in the Schur
    # action + inner-CG psolver.  12-13 outer iterations at every tested
    # size (vs ~87+ for the approx row) — each apply is costlier (the
    # psolver's Schur operator applications each run a u V-cycle), so
    # both rows are reported.
    q_solve, q_iters, q_rel = run(
        "fgmres + Schur (usolve)",
        lambda: make_solver(
            A, solver="fgmres", tol=1e-8, maxiter=200,
            precond=SchurPressureCorrection(A, pmask, approx_schur=False),
        ))
    print(json.dumps({
        "metric": f"{tag}_fgmres_schur_usolve_to_1e-8",
        "value": round(q_solve, 4),
        "unit": "seconds",
        "vs_baseline": round(3.41 / q_solve, 2),
    }))
    print(f"# quality row: {q_iters} iters (reference band: 35)")


if __name__ == "__main__":
    main()
