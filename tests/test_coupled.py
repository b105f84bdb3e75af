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
