"""Headline benchmark: 3D Poisson 150^3 (3.375M dof, 23.5M nnz), CG + AMG
(smoothed aggregation + SPAI0), solved to 1e-8 relative residual — the
reference's published shared-memory benchmark problem
(docs/benchmarks.rst:60-79; raw data docs/smem_data/poisson/).

Baseline: the reference's CUDA backend (Tesla K80) solves it in 0.55 s
after a 1.33 s setup at 24 iterations (docs/smem_data/poisson/
amgcl-cuda.txt:1).  vs_baseline = baseline_solve / our_solve (>1 is
faster than the reference).

TPU-native end to end: the operator is assembled *on the device* in DIA
form (models.poisson.poisson3d_dia), the hierarchy is built on-device by
stencil probing, and verification is an f64 device residual — the host
never touches an nnz-sized array.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time


def main():
    # Sandboxed hosts fault fresh pages at ~MB/s; warm the heap first so
    # host-side assembly/conversions run at memory speed.
    import sys as _sys
    _sys.path.insert(0, ".")
    from amgcl_tpu.utils.hostmem import ensure_fast_heap
    ensure_fast_heap()

    import threading

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_amgcl")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    # Speculative setup precompile: every hierarchy program is knowable
    # from host metadata (7-point stencil + grid dims), so compile them
    # all WHILE the tunnel session warms up (the ~2 min first-dispatch
    # wait below).  The real setup then finds its executables in the
    # grid_setup AOT memo.
    from amgcl_tpu.precond.grid_setup import precompile_grid_setup

    stencil = (-1.0, -1.0, -1.0, 6.0, -1.0, -1.0, -1.0)
    offsets = (-n * n, -n, -1, 0, 1, n, n * n)
    t_pre = time.time()
    pre_done = {}

    def _precompile():
        try:
            futs = precompile_grid_setup(
                offsets, stencil, (n, n, n), dtype=jnp.float32
            )
            for f in futs:
                f.result()
            pre_done["s"] = time.time() - t_pre
        except Exception as e:   # never fail the bench from the warmer
            pre_done["err"] = repr(e)

    threading.Thread(target=_precompile, daemon=True).start()

    # Per-process first-dispatch warmup, timed separately.  Measured on
    # this environment (2026-08, axon tunnel): the FIRST compiled
    # dispatch of ANY program — even `zeros(1)+1`, even with every cache
    # file already present (persistent-cache delta 0) — costs 120–175 s
    # of server-side session setup in a fresh process; subsequent
    # compiles are seconds.  This is what made recorded phases swing
    # 10x between rounds (r03 assemble 0.89 s vs r04 98.5 s: the cost
    # lands on whichever phase syncs first).  It is environment cost,
    # not framework work, so it must not masquerade as assembly/setup.
    t0 = time.time()
    _ = jax.devices()
    backend_init_s = time.time() - t0
    t0 = time.time()
    _ = float(jnp.zeros((), jnp.float32) + 1.0)
    first_dispatch_s = time.time() - t0
    from amgcl_tpu.models.poisson import poisson3d_dia
    from amgcl_tpu.coarsening.grid_aggregation import GridAggregation
    from amgcl_tpu.ops.spmv import spmv
    from amgcl_tpu import make_solver

    BASELINE_SOLVE_S = 0.55  # amgcl CUDA/K80, same problem, 24 iters

    t0 = time.time()
    A, rhs = poisson3d_dia(n, dtype=jnp.float64)
    # block_until_ready does not reliably sync through the tunnel; a
    # scalar fetch does — without it the assemble compile cost silently
    # shifts into whatever phase syncs next.
    _ = float(rhs[0])
    assemble_s = time.time() - t0

    t0 = time.time()
    # Mixed-precision driver: f32 CG+AMG inner solves, f64 defect
    # correction outer — converges to the true-1e-8 residual (verified
    # below in f64) with all Krylov arithmetic in f32.
    S = make_solver(
        A,
        solver="refine",
        tol=1e-8,
        maxiter=25,
        inner="cg",
        inner_tol=1e-4,
        inner_maxiter=50,
        coarsening=GridAggregation(dims=(n, n, n)),
    )
    setup_s = time.time() - t0
    sstats = getattr(S.precond, "setup_stats", {})

    x0 = jnp.zeros_like(rhs)

    # Warm-up: compile + first run (also forces a real sync via the scalar).
    x, info = S._compiled(rhs, x0)
    iters = int(info.iters)

    # Timed runs: scalar fetch forces completion (async dispatch otherwise
    # lies about timing on the tunnelled TPU).
    times = []
    for _ in range(3):
        t0 = time.time()
        x, info = S._compiled(rhs, x0)
        _ = int(info.iters)
        times.append(time.time() - t0)
    solve_s = min(times)

    # f64 device residual (scalar download only).
    r = rhs - spmv(A, x.astype(jnp.float64))
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    # the gate matches the metric's claim: true f64 residual below 1e-8
    assert rel < 1e-8, f"did not converge to 1e-8: {rel}"

    print(
        json.dumps(
            {
                "metric": f"poisson3d_{n}cube_cg_amg_solve_to_1e-8",
                "value": round(solve_s, 4),
                "unit": "seconds",
                "vs_baseline": round(BASELINE_SOLVE_S / solve_s, 2),
            }
        )
    )
    print(
        f"# iters={iters} rel_resid={rel:.2e} "
        f"backend_init={backend_init_s:.2f}s "
        f"first_dispatch={first_dispatch_s:.2f}s "
        f"assemble={assemble_s:.2f}s "
        f"setup={setup_s:.1f}s (compile={sstats.get('compile_s', -1):.1f}s "
        f"execute={sstats.get('execute_s', -1):.1f}s "
        f"predict={sstats.get('predict_s', -1):.1f}s "
        f"(fetch={sstats.get('fetch_s', -1):.1f}s "
        f"host={sstats.get('host_s', -1):.1f}s) "
        f"inv_fb={sstats.get('inv_fallback', False)} "
        f"inv={sstats.get('inv_s', 0):.1f}s "
        f"predicted={sstats.get('predicted')}) "
        f"precompile={pre_done.get('s', -1):.1f}s"
        f"{' precompile_err=' + pre_done['err'] if 'err' in pre_done else ''} "
        f"solve={solve_s:.4f}s "
        f"(baseline: amgcl CUDA/K80 setup 1.33s solve 0.55s @ 24 iters)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
