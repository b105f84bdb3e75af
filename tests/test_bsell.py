"""Block SELL (BSR windowed-gather) format and kernel tests.  Kernel
correctness runs in interpret mode on CPU; on-chip performance is
exercised by benchmarks/serena_bench.py.  Reference role:
amgcl/backend/vexcl_static_matrix.hpp:1 (block-value GPU kernels)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from amgcl_tpu.models.unstructured import fem_elasticity_3d, fem_poisson_2d
from amgcl_tpu.ops.pallas_bsell import (
    BlockSellMatrix, bsell_spmv_pallas, pack_bsell,
)


def _rcm_block(A, b):
    """Block-respecting RCM: permute block rows, expand to scalar."""
    B = sp.csr_matrix(sp.bsr_matrix(A, blocksize=(b, b)))
    pat = sp.csr_matrix(
        (np.ones(sp.bsr_matrix(A, blocksize=(b, b)).indices.shape[0]),
         sp.bsr_matrix(A, blocksize=(b, b)).indices,
         sp.bsr_matrix(A, blocksize=(b, b)).indptr),
    )
    p = sp.csgraph.reverse_cuthill_mckee(pat, symmetric_mode=True)
    ps = (p[:, None] * b + np.arange(b)[None, :]).ravel()
    M = sp.csr_matrix(A)[ps][:, ps].tocsr()
    M.sort_indices()
    return M


@pytest.fixture(scope="module")
def elas():
    A, _, _ = fem_elasticity_3d(2000)
    return _rcm_block(sp.csr_matrix(A.astype(np.float64)), 3)


def test_pack_roundtrip(elas):
    S = BlockSellMatrix.from_scipy(elas, block=3, dtype=jnp.float64)
    assert S is not None
    assert S.block == 3
    assert abs(S.to_scipy() - elas).max() < 1e-12
    assert S.shape == elas.shape


@pytest.mark.parametrize("b", [2, 4])
def test_other_block_sizes(b):
    A, _ = fem_poisson_2d(1200)
    A = sp.csr_matrix(A)
    C = np.eye(b) * 2.0 + 0.3
    M = sp.csr_matrix(sp.kron(A, C))
    M = _rcm_block(M, b)
    S = BlockSellMatrix.from_scipy(M, block=b, dtype=jnp.float64)
    assert S is not None and S.block == b
    x = np.random.default_rng(0).standard_normal(M.shape[0])
    y = S._spmv_xla(jnp.asarray(x))
    assert np.allclose(np.asarray(y), M @ x, atol=1e-8)


def test_xla_spmv(elas):
    S = BlockSellMatrix.from_scipy(elas, block=3, dtype=jnp.float64)
    x = np.random.default_rng(1).standard_normal(elas.shape[0])
    y = S._spmv_xla(jnp.asarray(x))
    assert np.allclose(np.asarray(y), elas @ x, atol=1e-8)


@pytest.mark.parametrize("R", [1, 4])
def test_kernel_interpret(elas, R):
    S = BlockSellMatrix.from_scipy(elas, block=3, dtype=jnp.float32, R=R)
    x = np.random.default_rng(2).standard_normal(
        elas.shape[0]
    ).astype(np.float32)
    y = bsell_spmv_pallas(S._m, jnp.asarray(x), S.arrays, interpret=True)
    ref = (elas @ x.astype(np.float64)).astype(np.float64)
    assert np.abs(np.asarray(y, dtype=np.float64) - ref).max() \
        < 2e-3 * np.abs(ref).max()


def test_spmv_dispatch_and_operator(elas):
    from amgcl_tpu.ops.spmv import spmv
    from amgcl_tpu.solver.common import as_operator

    S = BlockSellMatrix.from_scipy(elas, block=3, dtype=jnp.float64)
    x = np.random.default_rng(3).standard_normal(elas.shape[0])
    y = spmv(S, jnp.asarray(x))
    assert np.allclose(np.asarray(y), elas @ x, atol=1e-8)
    y2 = as_operator(S)(jnp.asarray(x))
    assert np.allclose(np.asarray(y2), np.asarray(y))


def test_scalar_block_rejected(elas):
    assert pack_bsell(elas, 1) is None


def test_window_cap_returns_none():
    rng = np.random.default_rng(3)
    n = 30_000
    Rm = sp.random(n, n, density=4e-4, random_state=rng, format="csr")
    Rm = sp.csr_matrix(Rm + sp.eye(n))
    M = sp.csr_matrix(sp.kron(Rm, np.eye(2) + 0.1))
    S = BlockSellMatrix.from_scipy(M, block=2, nw_cap=8)
    assert S is None


def test_f64_block_outer_uses_scalar_df_composite():
    """An f64 block operator forced to 'sell_f64' gets the scalar
    double-f32 SELL view (the Serena-class f64 outer SpMV path)."""
    from amgcl_tpu.ops.formats import from_scipy_auto
    from amgcl_tpu.ops.pallas_sell2 import Sell2F64Matrix

    A, _, _ = fem_elasticity_3d(1500)
    M = _rcm_block(sp.csr_matrix(A), 3)
    S = from_scipy_auto(M, block=3, dtype=jnp.float64, format="sell_f64")
    assert isinstance(S, Sell2F64Matrix)
    x = np.random.default_rng(11).standard_normal(M.shape[0])
    y = S._spmv_xla(jnp.asarray(x))
    assert np.allclose(np.asarray(y), M @ x, atol=1e-9)


def test_auto_select_prefers_bsell_when_forced():
    """from_scipy_auto picks BlockSellMatrix for unstructured block
    matrices when format='bsell' (TPU-gated in auto mode)."""
    from amgcl_tpu.ops.formats import from_scipy_auto

    A, _, _ = fem_elasticity_3d(1500)
    M = _rcm_block(sp.csr_matrix(A), 3)
    S = from_scipy_auto(M, block=3, dtype=jnp.float32, format="bsell")
    assert isinstance(S, BlockSellMatrix)


def test_vmem_R_shrink_on_dense_class(elas):
    """Dense block-row classes must shrink the per-program R so the
    streamed block stays under the scoped-VMEM budget (the 1M-dof
    Serena-class run OOMed VMEM at K8=312, R=4); the divisor-of-R pick
    keeps the grid exact and the result unchanged."""
    from amgcl_tpu.ops.pallas_sell2 import _fit_R

    # exact failing shape: b=3, K8=312, x2 resident ≈ 4.1 MiB at 343k
    # block columns -> Rc must drop below 4 once the residents are
    # subtracted from the streaming budget (the call site passes them)
    stream = (4 * 9 + 4) * 312 * 128
    resident = 3 * 2688 * 128 * 4 + 300 * 1024
    Rc = _fit_R(4, 8, stream, resident_bytes=resident)
    assert Rc in (1, 2) and 8 % Rc == 0
    assert _fit_R(4, 8, 1024) == 4          # small classes keep R

    # end-to-end: artificially dense block rows through the kernel
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    nb = 140
    b = 2
    dense = sp.random(nb, nb, density=0.6, random_state=7,
                      format="csr")
    dense = dense + sp.eye(nb)
    A = sp.kron(dense, np.ones((b, b))).tocsr()
    A.data[:] = rng.standard_normal(len(A.data))
    S = BlockSellMatrix.from_scipy(A, block=b, dtype=jnp.float32,
                                   nw_cap=256)
    assert S is not None
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = bsell_spmv_pallas(S._m, jnp.asarray(x), S.arrays, interpret=True)
    ref = A @ x.astype(np.float64)
    assert np.abs(np.asarray(y, np.float64) - ref).max() \
        < 2e-3 * np.abs(ref).max()
