"""Iteration-count regression oracle.

The reference's tutorials pin exact iteration counts per configuration
(docs/tutorial/*.rst — SURVEY.md §4 calls them the de-facto regression
oracle).  These pins catch silent convergence regressions (a wrong
smoother weight, a broken transfer, a dtype slip) that residual-only
tests would still pass at higher cost."""

import numpy as np
import pytest

from amgcl_tpu import make_solver
from amgcl_tpu.models.poisson import poisson3d, poisson2d
from amgcl_tpu.models.coupled import reservoir2d


def _iters(A, rhs, **kw):
    S = make_solver(A, tol=1e-8, maxiter=300, **kw)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7
    return int(info.iters)


def test_pin_poisson_cg_amg():
    """CG + SA + SPAI0 on 32^3 Poisson: 13 iterations (the headline
    configuration; reference solves the same problem class in 24)."""
    A, rhs = poisson3d(32)
    assert _iters(A, rhs, solver="cg") in (12, 13, 14)


def test_pin_poisson_bicgstab():
    A, rhs = poisson3d(24)
    it = _iters(A, rhs, solver="bicgstab")
    assert it <= 10, it


def test_pin_poisson2d_rs():
    from amgcl_tpu.coarsening.ruge_stuben import RugeStuben

    A, rhs = poisson2d(32)
    it = _iters(A, rhs, solver="cg", coarsening=RugeStuben())
    assert it <= 12, it


def test_pin_cpr_reservoir():
    """Two-stage CPR is h-independent on the reservoir synthetic."""
    from amgcl_tpu.precond.cpr import CPR

    for n in (24, 48):
        A, rhs = reservoir2d(n)
        S = make_solver(A, solver="bicgstab", tol=1e-8, maxiter=50,
                        precond=CPR(A, block_size=2))
        x, info = S(rhs)
        r = rhs - A @ np.asarray(x, dtype=np.float64)
        assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7
        assert int(info.iters) <= 6, (n, int(info.iters))


def test_pin_refine_total_inner():
    """Mixed-precision refinement costs at most ~25% more inner
    iterations than the f64 Krylov solve it replaces."""
    A, rhs = poisson3d(24)
    base = _iters(A, rhs, solver="cg")
    ref = _iters(A, rhs, solver="refine", inner="cg", inner_tol=1e-4,
                 inner_maxiter=50)
    assert ref <= base + max(3, base // 3), (base, ref)
