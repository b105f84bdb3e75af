"""Combinatorial solver × smoother × coarsening sweep — the backbone of
the reference's test strategy (tests/test_solver.hpp:120-208: runtime
enums crossed on a generated Poisson problem, each solved to 1e-4).

A full 9×10×4 cross is minutes of compile on CPU; this sweep crosses
each axis against the others' defaults plus a rotating pairing so every
(solver, smoother) and (solver, coarsening) combination appears at least
once across the suite's lifetime of seeds."""

import numpy as np
import pytest

from amgcl_tpu import make_solver
from amgcl_tpu.models.poisson import poisson3d
from amgcl_tpu.relaxation import make_smoother
from amgcl_tpu.coarsening import make_coarsening
from amgcl_tpu.solver import SOLVERS

SMOOTHERS = ["damped_jacobi", "spai0", "spai1", "chebyshev", "gauss_seidel",
             "ilu0", "ilu0_chow_patel", "iluk", "ilup", "ilut"]
COARSENINGS = ["smoothed_aggregation", "smoothed_aggr_emin", "aggregation",
               "ruge_stuben"]
KRYLOV = [s for s in sorted(SOLVERS) if s != "preonly"]


@pytest.fixture(scope="module")
def prob():
    A, rhs = poisson3d(10)
    return A, rhs


def _solve(A, rhs, **kw):
    S = make_solver(A, tol=1e-6, maxiter=300, **kw)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < 1e-4, f"rel={rel} iters={int(info.iters)}"


@pytest.mark.parametrize("i,solver", list(enumerate(KRYLOV)))
def test_solver_cross(prob, i, solver):
    """Every Krylov solver against a rotating smoother AND coarsening."""
    A, rhs = prob
    smoother = SMOOTHERS[i % len(SMOOTHERS)]
    coarsening = COARSENINGS[i % len(COARSENINGS)]
    _solve(A, rhs, solver=solver,
           relaxation=make_smoother(smoother),
           coarsening=make_coarsening(coarsening))


@pytest.mark.parametrize("i,smoother", list(enumerate(SMOOTHERS)))
def test_smoother_cross(prob, i, smoother):
    """Every smoother against a rotating solver and coarsening."""
    A, rhs = prob
    solver = KRYLOV[(i + 3) % len(KRYLOV)]
    coarsening = COARSENINGS[(i + 1) % len(COARSENINGS)]
    _solve(A, rhs, solver=solver,
           relaxation=make_smoother(smoother),
           coarsening=make_coarsening(coarsening))


@pytest.mark.parametrize("coarsening", COARSENINGS)
def test_coarsening_pmis_cross(prob, coarsening):
    """Every coarsening; aggregation-based ones also with PMIS."""
    A, rhs = prob
    _solve(A, rhs, solver="bicgstab",
           coarsening=make_coarsening(coarsening))
    if coarsening == "smoothed_aggregation":
        _solve(A, rhs, solver="cg",
               coarsening=make_coarsening(coarsening, aggregates="pmis"))


@pytest.mark.slow
@pytest.mark.parametrize("solver", KRYLOV)
@pytest.mark.parametrize("smoother", SMOOTHERS)
@pytest.mark.parametrize("coarsening", COARSENINGS)
def test_full_cross(prob, solver, smoother, coarsening):
    """The complete solver × smoother × coarsening product — the exact
    shape of the reference's sweep (tests/test_solver.hpp:120-208).
    Marked slow: run with `pytest -m slow` (the rotating cross above
    covers every pair in the default run)."""
    A, rhs = prob
    _solve(A, rhs, solver=solver,
           relaxation=make_smoother(smoother),
           coarsening=make_coarsening(coarsening))
