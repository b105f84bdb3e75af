"""Core format + kernel tests: device SpMV against scipy on random and
Poisson matrices (SURVEY.md §7 stage 1 test contract)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from amgcl_tpu.ops.formats import SparseMatrix, diagonal
from amgcl_tpu.ops.spmv import spmv, spmv_t, residual
from amgcl_tpu.models.poisson import poisson3d, poisson2d


def random_csr(n, m, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=rng, format="csr")
    A.data = rng.standard_normal(A.nnz)
    return A


@pytest.mark.parametrize("shape", [(64, 64), (100, 37), (37, 100)])
def test_spmv_matches_scipy_random(shape):
    A = random_csr(*shape, density=0.1)
    Ad = SparseMatrix.from_scipy(A, dtype=jnp.float64)
    x = np.random.default_rng(1).standard_normal(shape[1])
    np.testing.assert_allclose(
        np.asarray(spmv(Ad, jnp.asarray(x))), A @ x, rtol=1e-12, atol=1e-12
    )


def test_spmv_poisson():
    A, _ = poisson3d(8)
    Ad = SparseMatrix.from_scipy(A, dtype=jnp.float64)
    x = np.random.default_rng(2).standard_normal(A.shape[0])
    np.testing.assert_allclose(
        np.asarray(spmv(Ad, jnp.asarray(x))), A @ x, rtol=1e-12, atol=1e-12
    )


def test_spmv_transpose():
    A = random_csr(50, 80, density=0.1)
    Ad = SparseMatrix.from_scipy(A, dtype=jnp.float64)
    x = np.random.default_rng(3).standard_normal(50)
    np.testing.assert_allclose(
        np.asarray(spmv_t(Ad, jnp.asarray(x))), A.T @ x, rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("block", [2, 3, 4])
def test_spmv_block(block):
    A, _ = poisson2d(6)
    Ab = sp.kron(A, np.eye(block) + 0.1 * np.arange(block * block).reshape(block, block))
    Ab = sp.csr_matrix(Ab)
    Ad = SparseMatrix.from_scipy(Ab, block=block, dtype=jnp.float64)
    assert Ad.block == block
    x = np.random.default_rng(4).standard_normal(Ab.shape[1])
    np.testing.assert_allclose(
        np.asarray(spmv(Ad, jnp.asarray(x))), Ab @ x, rtol=1e-11, atol=1e-11
    )


def test_block_roundtrip():
    A, _ = poisson2d(5)
    Ab = sp.csr_matrix(sp.kron(A, np.eye(2)))
    Ad = SparseMatrix.from_scipy(Ab, block=2, dtype=jnp.float64)
    back = Ad.to_scipy()
    diff = abs(Ab - back)
    assert diff.max() if diff.nnz else 0 < 1e-14


def test_diagonal():
    A = random_csr(40, 40, density=0.2, seed=5)
    A = A + sp.eye(40) * 3.0
    Ad = SparseMatrix.from_scipy(sp.csr_matrix(A), dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(diagonal(Ad)), A.diagonal(), rtol=1e-12
    )


def test_residual():
    A = random_csr(30, 30, density=0.3, seed=6)
    Ad = SparseMatrix.from_scipy(A, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    x, b = rng.standard_normal(30), rng.standard_normal(30)
    np.testing.assert_allclose(
        np.asarray(residual(jnp.asarray(b), Ad, jnp.asarray(x))),
        b - A @ x,
        rtol=1e-12, atol=1e-12,
    )
