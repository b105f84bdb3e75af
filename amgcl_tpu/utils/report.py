"""Hierarchy report — the analogue of operator<<(ostream, amg)
(reference: amgcl/amg.hpp:560-598): per-level unknowns/nonzeros/memory and
the grid/operator complexities."""

from __future__ import annotations


def _human_bytes(b: float) -> str:
    for unit in ("B", "K", "M", "G", "T"):
        if abs(b) < 1024.0:
            return f"{b:6.2f} {unit}"
        b /= 1024.0
    return f"{b:6.2f} P"


def hierarchy_report(amg) -> str:
    levels = amg.levels
    rows0 = levels[0].A.shape[0]
    nnz0 = levels[0].A.nnz
    sum_rows = sum(l.A.shape[0] for l in levels)
    sum_nnz = sum(l.A.nnz for l in levels)

    lines = []
    lines.append(f"Number of levels:    {len(levels)}")
    lines.append(f"Operator complexity: {sum_nnz / max(nnz0, 1):.2f}")
    lines.append(f"Grid complexity:     {sum_rows / max(rows0, 1):.2f}")
    lines.append("")
    lines.append("level     unknowns       nonzeros      memory  smoother")
    lines.append("--------------------------------------------------------")
    for i, l in enumerate(levels):
        mem = l.A.nbytes
        if l.P is not None:
            mem += l.P.nbytes + l.R.nbytes
        if l.coarse_inv is not None:
            mem += l.coarse_inv.size * l.coarse_inv.dtype.itemsize
        frac = 100.0 * l.A.nnz / max(sum_nnz, 1)
        # Per-level smoother state type: makes silent per-level
        # substitutions (e.g. GS degrading to Jacobi on a >max_colors
        # level) visible in the report, not just in a warning.
        relax = getattr(l, "relax", None)
        sm = type(relax).__name__.removesuffix("State") if relax is not None \
            else ("direct" if l.coarse_inv is not None else "-")
        lines.append(
            f"{i:5d} {l.A.shape[0]:12d} {l.A.nnz:14d} {_human_bytes(mem)}"
            f" ({frac:5.2f}%)  {sm}"
        )
    return "\n".join(lines)


def bandwidth_report(solver, rhs=None, repeats: int = 5) -> str:
    """Per-solve effective-bandwidth roofline report.

    The reference publishes wall times only; on TPU the honest efficiency
    metric is bytes-moved / time against the HBM roofline (the pluggable
    perf-counter role of amgcl/perf_counter/).  Estimates the bytes one
    preconditioned Krylov iteration must move (operator + hierarchy data
    once per cycle stage, vectors per op) and divides by the measured
    per-iteration time.  Timing forces a scalar fetch — async dispatch
    otherwise misreports on tunnelled devices.
    """
    import time

    import jax.numpy as jnp

    A = solver.A_dev
    rhs = (
        jnp.ones(A.shape[0], dtype=A.dtype)
        if rhs is None else jnp.asarray(rhs, dtype=A.dtype)
    )
    x0 = jnp.zeros_like(rhs)
    x, info = solver._compiled(rhs, x0)
    iters = max(int(info.iters), 1)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        x, info = solver._compiled(rhs, x0)
        _ = int(info.iters)
        best = min(best, time.time() - t0)

    vec = A.shape[0] * jnp.dtype(A.dtype).itemsize
    per_iter = A.nbytes + 5 * vec          # Krylov: 1 SpMV + dots/axpbys
    levels = getattr(solver.precond, "levels", None)
    if levels is not None:
        prm = solver.precond.prm
        sweeps = prm.npre + prm.npost + 1  # pre+post sweeps + residual
        for depth, l in enumerate(levels):
            # level k is visited ncycle^k times per cycle application
            visits = prm.ncycle ** depth
            lv = l.A.shape[0] * jnp.dtype(l.A.dtype).itemsize
            if l.coarse_inv is not None:
                per_iter += visits * (
                    l.coarse_inv.size * l.coarse_inv.dtype.itemsize
                )
                continue
            per_iter += visits * sweeps * (l.A.nbytes + 2 * lv)
            if l.P is not None and hasattr(l.P, "nbytes"):
                per_iter += visits * (l.P.nbytes + l.R.nbytes)

    t_iter = best / iters
    gbs = per_iter / t_iter / 1e9
    return (
        f"solve: {best:.4f} s, {iters} iterations "
        f"({t_iter*1e3:.2f} ms/iter)\n"
        f"estimated traffic/iter: {per_iter/1e6:.1f} MB -> "
        f"effective {gbs:.0f} GB/s"
    )
