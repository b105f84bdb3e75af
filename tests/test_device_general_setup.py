"""On-device general (PMIS + sort-RAP) setup — correctness against the
host Galerkin product and end-to-end convergence (reference capability:
the CPU setup loop amgcl/amg.hpp:467-500 and detail/spgemm.hpp:62,
executed on device instead)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from amgcl_tpu.models.poisson import poisson3d
from amgcl_tpu.models.unstructured import fem_poisson_2d
from amgcl_tpu.ops.formats import SparseMatrix
from amgcl_tpu.precond.amg import AMGParams
from amgcl_tpu.precond.ell_setup import DeviceGeneralAMG
from amgcl_tpu.solver import cg


def test_rap_matches_host_product():
    A, _ = poisson3d(12)
    P = DeviceGeneralAMG(A, params=AMGParams(coarse_enough=200))
    lv = P.levels[0]
    Ph, Rh, Ah = lv.P.to_scipy(), lv.R.to_scipy(), lv.A.to_scipy()
    # R is exactly Pᵀ
    assert abs(Rh - Ph.T).nnz == 0 or abs(Rh - Ph.T).max() < 1e-6
    # device Ac equals the host triple product to f32 roundoff
    Ac_ref = Rh @ Ah @ Ph
    Ac_dev = P.levels[1].A.to_scipy()
    err = abs(Ac_ref - Ac_dev)
    scale = abs(Ah).max()
    assert (err.max() if err.nnz else 0.0) < 1e-5 * scale


def test_prolongation_partitions_unity_scale():
    # P columns sum row-wise to ~1 on interior rows (piecewise-constant
    # tentative smoothed by I - w D^-1 A_F)
    A, _ = poisson3d(10)
    P = DeviceGeneralAMG(A, params=AMGParams(coarse_enough=200))
    Ph = P.levels[0].P.to_scipy()
    rs = np.asarray(Ph.sum(axis=1)).ravel()
    assert rs.max() <= 1.0 + 1e-5
    assert (rs > 0.2).mean() > 0.9


def test_structured_convergence():
    A, rhs = poisson3d(16)
    P = DeviceGeneralAMG(A, params=AMGParams(coarse_enough=200))
    Adev = SparseMatrix.from_scipy(sp.csr_matrix(A), dtype=jnp.float64)
    x, info = cg(Adev, P, jnp.asarray(rhs), tol=1e-8, maxiter=60)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    assert r / np.linalg.norm(rhs) < 1e-7
    assert int(info.iters) <= 25


def test_unstructured_convergence():
    A, rhs = fem_poisson_2d(4000)
    A = sp.csr_matrix(A)
    P = DeviceGeneralAMG(A, params=AMGParams(coarse_enough=200))
    assert len(P.levels) >= 2
    Adev = SparseMatrix.from_scipy(A, dtype=jnp.float64)
    x, info = cg(Adev, P, jnp.asarray(rhs), tol=1e-8, maxiter=200)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    assert r / np.linalg.norm(rhs) < 1e-7
    assert int(info.iters) <= 60


def test_api_device_setup_general():
    import amgcl_tpu

    A, rhs = fem_poisson_2d(3000)
    A = sp.csr_matrix(A)
    S = amgcl_tpu.make_solver(A, device_setup=True)
    x, info = S(rhs)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    assert r / np.linalg.norm(rhs) < 1e-7


def test_pmis_seed_reproducible():
    A, _ = poisson3d(8)
    P1 = DeviceGeneralAMG(A, seed=7, params=AMGParams(coarse_enough=100))
    P2 = DeviceGeneralAMG(A, seed=7, params=AMGParams(coarse_enough=100))
    assert P1.levels[1].A.shape == P2.levels[1].A.shape
    d = abs(P1.levels[1].A.to_scipy() - P2.levels[1].A.to_scipy())
    assert (d.max() if d.nnz else 0.0) == 0.0

def test_block_aligned_setup():
    """block > 1: aggregation runs on the condensed block-Frobenius
    graph (the reference's block-value setup role,
    value_type/static_matrix.hpp + coarsening/smoothed_aggregation.hpp);
    levels stay block-aligned and the RAP matches the host product."""
    from amgcl_tpu.models.unstructured import fem_elasticity_3d

    A, rhs, _ = fem_elasticity_3d(400)
    A = sp.csr_matrix(A)
    P = DeviceGeneralAMG(A, block=3, params=AMGParams(coarse_enough=120))
    assert len(P.levels) >= 2
    for lv in P.levels:
        assert lv.A.shape[0] % 3 == 0
    lv = P.levels[0]
    Ph, Rh = lv.P.to_scipy(), lv.R.to_scipy()
    Ac_ref = Rh @ A @ Ph
    Ac_dev = P.levels[1].A.to_scipy()
    err = abs(sp.csr_matrix(Ac_ref) - Ac_dev)
    assert (err.max() if err.nnz else 0.0) < 1e-5 * abs(A).max()
    # convergence: block-aligned aggregation should beat the pointwise
    # scalar device setup on an elasticity system
    Adev = SparseMatrix.from_scipy(A, dtype=jnp.float64)
    x, info = cg(Adev, P, jnp.asarray(rhs), tol=1e-8, maxiter=120)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    assert r / np.linalg.norm(rhs) < 1e-7
    assert int(info.iters) <= 70


def test_block_api_device_setup():
    import amgcl_tpu
    from amgcl_tpu.models.unstructured import fem_elasticity_3d

    A, rhs, _ = fem_elasticity_3d(400)
    A = sp.csr_matrix(A)
    # n < the default coarse_enough would yield a single-level hierarchy
    # (no P, so no fast-format L0 substitution to assert on)
    S = amgcl_tpu.make_solver(
        A, block=3, device_setup=True, maxiter=150,
        amg_params=AMGParams(coarse_enough=200),
    )
    x, info = S(rhs)
    r = np.linalg.norm(rhs - A @ np.asarray(x, np.float64))
    assert r / np.linalg.norm(rhs) < 1e-7
    # the finest-level operator is the fast auto-selected block format,
    # not the setup's scalar ELL expansion
    assert S.precond.levels[0].A.block == 3
