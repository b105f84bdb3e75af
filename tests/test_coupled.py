"""Composite preconditioner tests: CPR, Schur pressure correction,
deflation (the reference's preconditioner/ + deflated_solver capabilities,
exercised the way the reference tutorials do — by convergence)."""

import numpy as np
import pytest
import jax.numpy as jnp

from amgcl_tpu.models.coupled import stokes2d, reservoir2d
from amgcl_tpu.models.poisson import poisson3d
from amgcl_tpu import make_solver
from amgcl_tpu.precond import (
    CPR, SchurPressureCorrection, DeflatedSolver, constant_deflation,
)


def test_schur_pressure_correction():
    A, rhs, pmask = stokes2d(12)
    P = SchurPressureCorrection(A, pmask, approx_schur=False)
    S = make_solver(A, solver="fgmres", precond=P, tol=1e-8, maxiter=200)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < 1e-6, f"rel={rel}, iters={int(info.iters)}"
    # The whole point of SPC: far fewer iterations than unpreconditioned.
    assert int(info.iters) < 60


def test_schur_approx():
    A, rhs, pmask = stokes2d(10)
    P = SchurPressureCorrection(A, pmask, approx_schur=True)
    S = make_solver(A, solver="fgmres", precond=P, tol=1e-8, maxiter=200)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6


def test_cpr():
    A, rhs = reservoir2d(12)
    P = CPR(A, block_size=2)
    S = make_solver(A, solver="bicgstab", precond=P, tol=1e-8, maxiter=200)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < 1e-6, f"rel={rel}, iters={int(info.iters)}"


def test_cpr_beats_plain_smoother():
    A, rhs = reservoir2d(16)
    Pc = CPR(A, block_size=2)
    S1 = make_solver(A, solver="bicgstab", precond=Pc, tol=1e-8, maxiter=300)
    _, i_cpr = S1(rhs)
    S2 = make_solver(A, solver="bicgstab", precond="relaxation",
                     tol=1e-8, maxiter=300)
    _, i_rel = S2(rhs)
    assert int(i_cpr.iters) <= int(i_rel.iters)


def test_deflated_solver():
    A, rhs = poisson3d(12)
    Z = constant_deflation(A.shape[0], 8)
    D = DeflatedSolver(A, Z, solver="cg", tol=1e-8, maxiter=100)
    x, info = D(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < 1e-7, f"rel={rel}, iters={int(info.iters)}"


def test_cpr_drs():
    """Dynamic-row-sum CPR (cpr_drs role): converges, and the weight
    computation honours the dominance thresholds (saturated equations
    with weak own-pressure coupling are dropped from the reduction)."""
    from amgcl_tpu.precond.cpr import CPRDrs
    import scipy.sparse as sp

    A, rhs = reservoir2d(12)
    P = CPRDrs(A, block_size=2)
    S = make_solver(A, solver="bicgstab", precond=P, tol=1e-8, maxiter=400)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6

    # with eps_dd -> inf every non-pressure equation is killed
    P2 = CPRDrs(A, block_size=2, eps_dd=1e30)
    W = P2.compute_weights(sp.csr_matrix(A), 2)
    assert (W[:, 0] == 1).all()

    # user weights pass through
    P3 = CPRDrs(A, block_size=2, weights=np.full(A.shape[0], 0.5))
    W3 = P3.compute_weights(sp.csr_matrix(A), 2)
    assert set(np.unique(W3)) <= {0.0, 0.5}


def test_dist_cpr():
    """Distributed CPR (mpi::cpr role) converges on the reservoir
    problem with the pressure hierarchy sharded."""
    import jax
    from amgcl_tpu.parallel.dist_solver import DistSolver

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs multiple devices")
    A, rhs = reservoir2d(16)
    D = DistSolver(A, "bicgstab", precond="cpr", cpr_block_size=2,
                   n_shards=4, tol=1e-8, maxiter=200)
    x, info = D(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6


def test_dist_schur_matches_serial():
    """Distributed Schur pressure correction (mpi::schur role) matches
    the serial iteration count (same operators, shard-interleaved
    layout)."""
    import jax
    from amgcl_tpu.parallel.dist_solver import DistSolver

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs multiple devices")
    A, rhs, pmask = stokes2d(10)
    P = SchurPressureCorrection(A, pmask, approx_schur=True)
    S = make_solver(A, solver="fgmres", precond=P, tol=1e-8, maxiter=200)
    _, i_ser = S(rhs)

    D = DistSolver(A, "fgmres", precond="schur", pmask=pmask, n_shards=4,
                   tol=1e-8, maxiter=200)
    x, i_dist = D(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6
    assert abs(int(i_dist.iters) - int(i_ser.iters)) <= 2
