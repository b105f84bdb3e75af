"""SELL (vreg-windowed sliced-ELL) format and kernel tests.

The Pallas kernel itself runs in interpret mode here (CPU); on-chip
correctness and performance are exercised by
benchmarks/unstructured_bench.py.  Reference role:
amgcl/backend/cuda.hpp:61 (format-general accelerated SpMV)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from amgcl_tpu.models.unstructured import fem_poisson_2d
from amgcl_tpu.models.poisson import poisson3d
from amgcl_tpu.ops.pallas_sell import SellMatrix, sell_spmv_pallas


def _rcm(A):
    p = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    B = A[p][:, p].tocsr()
    B.sort_indices()
    return B


@pytest.fixture(scope="module")
def fem():
    A, _ = fem_poisson_2d(4000)
    return _rcm(sp.csr_matrix(A.astype(np.float32)))


def test_pack_roundtrip(fem):
    S = SellMatrix.from_scipy(fem, dtype=jnp.float32)
    assert S is not None
    assert abs(S.to_scipy() - fem).max() < 1e-6
    assert S.nnz == fem.nnz


def test_xla_fallback_spmv(fem):
    S = SellMatrix.from_scipy(fem, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(fem.shape[0])
    y = S._spmv_xla(jnp.asarray(x))
    ref = fem.astype(np.float64) @ x
    assert np.allclose(np.asarray(y), ref, atol=1e-5)


def test_kernel_interpret(fem):
    S = SellMatrix.from_scipy(fem, dtype=jnp.float32)
    x = np.random.default_rng(1).standard_normal(
        fem.shape[0]
    ).astype(np.float32)
    y = sell_spmv_pallas(
        S._m, jnp.asarray(x), S.data, S.enc, S.bases, interpret=True
    )
    ref = fem @ x
    assert np.abs(np.asarray(y) - ref).max() < 1e-3 * np.abs(ref).max()


def test_rectangular():
    A, _ = fem_poisson_2d(2000)
    A = _rcm(sp.csr_matrix(A.astype(np.float32)))
    R = A[: A.shape[0] // 3]            # wide rectangular
    S = SellMatrix.from_scipy(R, dtype=jnp.float32)
    assert S is not None and S.shape == R.shape
    x = np.random.default_rng(2).standard_normal(
        R.shape[1]
    ).astype(np.float32)
    y = sell_spmv_pallas(
        S._m, jnp.asarray(x), S.data, S.enc, S.bases, interpret=True
    )
    assert np.abs(np.asarray(y) - R @ x).max() < 1e-3


def test_window_cap_returns_none():
    # a random permutation has no column locality: every vreg touches
    # ~128 distinct 1024-blocks, far over any sensible cap
    rng = np.random.default_rng(3)
    n = 40_000
    R = sp.random(n, n, density=3e-4, random_state=rng, format="csr")
    R = sp.csr_matrix(R + sp.eye(n))
    S = SellMatrix.from_scipy(R, dtype=jnp.float32, nw_cap=8)
    assert S is None


def test_structured_also_packs():
    A, _ = poisson3d(12)
    A = sp.csr_matrix(A.astype(np.float32))
    S = SellMatrix.from_scipy(A, dtype=jnp.float32)
    assert S is not None
    x = np.random.default_rng(4).standard_normal(
        A.shape[0]
    ).astype(np.float32)
    y = sell_spmv_pallas(
        S._m, jnp.asarray(x), S.data, S.enc, S.bases, interpret=True
    )
    assert np.abs(np.asarray(y) - A @ x).max() < 1e-3
