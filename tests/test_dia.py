"""DIA format + structured-grid fast path tests."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from amgcl_tpu.ops.formats import DiaMatrix, dia_viable, from_scipy_auto, SparseMatrix
from amgcl_tpu.ops.spmv import spmv
from amgcl_tpu.models.poisson import poisson3d, poisson2d
from amgcl_tpu.coarsening.grid_aggregation import (
    GridAggregation, GridTransfer, grid_aggregate_ids,
)
from amgcl_tpu import make_solver


def test_dia_roundtrip_and_spmv():
    A, _ = poisson3d(8)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float64)
    assert D.width == 7
    back = D.to_scipy()
    assert abs(A - back).max() < 1e-14
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    np.testing.assert_allclose(
        np.asarray(spmv(D, jnp.asarray(x))), A @ x, rtol=1e-12, atol=1e-12
    )


def test_dia_rectangular():
    rng = np.random.default_rng(1)
    A = sp.diags([rng.standard_normal(30), rng.standard_normal(30)], [0, 5],
                 shape=(30, 40)).tocsr()
    D = DiaMatrix.from_scipy(A, dtype=jnp.float64)
    x = rng.standard_normal(40)
    np.testing.assert_allclose(
        np.asarray(spmv(D, jnp.asarray(x))), A @ x, rtol=1e-12, atol=1e-12
    )


def test_auto_format_selection():
    A, _ = poisson3d(8)
    assert isinstance(from_scipy_auto(A), DiaMatrix)
    rng = np.random.default_rng(2)
    R = sp.random(500, 500, density=0.02, random_state=rng, format="csr")
    R = R + sp.eye(500)
    picked = from_scipy_auto(sp.csr_matrix(R))
    from amgcl_tpu.ops.formats import HybridEllMatrix
    # wide-tailed random degrees now select the tiered (hybrid) ELL
    assert isinstance(picked, (SparseMatrix, HybridEllMatrix))
    assert not isinstance(picked, DiaMatrix)


def test_grid_aggregate_ids():
    ids, cdims = grid_aggregate_ids((4, 4))
    assert cdims == (2, 2)
    grid = ids.reshape(4, 4)
    assert grid[0, 0] == grid[1, 1] == 0
    assert grid[0, 2] == grid[1, 3]
    assert len(np.unique(ids)) == 4


def test_grid_transfer_matches_scipy():
    """Matrix-free device P/R must match the host scipy P/R exactly."""
    n = 10
    A, _ = poisson2d(n)
    c = GridAggregation(dims=(n, n))
    P, R = c.transfer_operators(A)
    gt = c.device_transfer(jnp.float64)
    rng = np.random.default_rng(3)
    xc = rng.standard_normal(P.shape[1])
    xf = rng.standard_normal(P.shape[0])
    np.testing.assert_allclose(
        np.asarray(gt.prolong(jnp.asarray(xc))), P @ xc, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(gt.restrict(jnp.asarray(xf))), R @ xf, rtol=1e-12, atol=1e-12
    )


def test_grid_transfer_odd_dims():
    n = 9
    A, _ = poisson2d(n)
    c = GridAggregation(dims=(n, n))
    P, R = c.transfer_operators(A)
    gt = c.device_transfer(jnp.float64)
    rng = np.random.default_rng(4)
    xc = rng.standard_normal(P.shape[1])
    xf = rng.standard_normal(P.shape[0])
    np.testing.assert_allclose(
        np.asarray(gt.prolong(jnp.asarray(xc))), P @ xc, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(gt.restrict(jnp.asarray(xf))), R @ xf, rtol=1e-12, atol=1e-12
    )


def test_grid_hierarchy_all_dia():
    """With grid aggregation the whole Poisson hierarchy stays DIA."""
    A, rhs = poisson3d(16)
    S = make_solver(
        A, solver="cg", tol=1e-8, maxiter=100,
        coarsening=GridAggregation(dims=(16, 16, 16)),
    )
    for lvl in S.precond.levels:
        assert isinstance(lvl.A, DiaMatrix), "level matrix must be DIA"
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7
    assert int(info.iters) <= 30


def test_block_dia_matches_scipy():
    """Block-DIA spmv/roundtrip exactness and auto-selection for banded
    block matrices (the Serena-class fast path)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from amgcl_tpu.models.poisson import poisson3d_block
    from amgcl_tpu.ops.formats import (
        BlockDiaMatrix, block_dia_viable, from_scipy_auto)
    from amgcl_tpu.ops.spmv import spmv

    A, _ = poisson3d_block(8, block=3)
    assert block_dia_viable(A, 3)
    M = BlockDiaMatrix.from_scipy(A, block=3, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    assert np.abs(np.asarray(spmv(M, jnp.asarray(x))) - A @ x).max() < 1e-12
    rt = abs(M.to_scipy() - sp.csr_matrix(A))
    assert (rt.max() if rt.nnz else 0.0) == 0.0
    assert type(from_scipy_auto(A, block=3)).__name__ == "BlockDiaMatrix"

    # diagonal() returns (nb, b, b)
    from amgcl_tpu.ops.formats import diagonal
    D = np.asarray(diagonal(M))
    nb = A.shape[0] // 3
    ref = sp.bsr_matrix(A, blocksize=(3, 3))
    assert D.shape == (nb, 3, 3)


def test_block_dia_pallas_interpret():
    """The streaming block kernel matches the XLA path (interpret mode)."""
    import jax.numpy as jnp
    from amgcl_tpu.models.poisson import poisson3d_block
    from amgcl_tpu.ops.formats import BlockDiaMatrix
    from amgcl_tpu.ops.pallas_spmv import spmv_block_dia_pallas
    from amgcl_tpu.ops.spmv import spmv

    A, _ = poisson3d_block(6, block=2)
    M = BlockDiaMatrix.from_scipy(A, block=2, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(A.shape[0]), jnp.float32
    )
    y1 = spmv_block_dia_pallas(M, x, tile=128, interpret=True)
    y2 = spmv(M, x)
    assert float(abs(y1 - y2).max()) < 1e-4
