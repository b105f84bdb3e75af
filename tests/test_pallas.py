"""Pallas kernel tests (interpret mode — runs on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from amgcl_tpu.models.poisson import poisson3d, poisson2d
from amgcl_tpu.ops.formats import DiaMatrix
from amgcl_tpu.ops.spmv import spmv
from amgcl_tpu.ops.pallas_spmv import spmv_dia_pallas


@pytest.mark.parametrize("n,tile", [(12, 512), (10, 128)])
def test_pallas_dia_spmv_matches(n, tile):
    A, _ = poisson3d(n)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(A.shape[0]), jnp.float32
    )
    y_ref = spmv(D, x)
    y = spmv_dia_pallas(D, x, tile=tile, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )


def test_pallas_dia_wide_offsets():
    # 2D poisson has offsets (-n, -1, 0, 1, n): wide halo
    A, _ = poisson2d(24)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(A.shape[0]), jnp.float32
    )
    y = spmv_dia_pallas(D, x, tile=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(spmv(D, x)), rtol=1e-6, atol=1e-6
    )


def test_prepad_hoisting_preserves_semantics():
    """prepad_pallas widens square DiaMatrix data to the kernel tile
    multiple; both the XLA fallback spmv and the Pallas kernel must give
    identical results on the widened operator, and rectangular operators
    stay untouched."""
    from amgcl_tpu.ops.pallas_spmv import prepad_pallas

    A, _ = poisson3d(10)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    Dp = prepad_pallas(D)
    assert Dp.data.shape[1] >= D.data.shape[1]
    assert Dp.shape == D.shape
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(A.shape[0]), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(spmv(Dp, x)), np.asarray(spmv(D, x)),
        rtol=1e-6, atol=1e-6,
    )
    y = spmv_dia_pallas(Dp, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(spmv(D, x)), rtol=1e-6, atol=1e-6
    )
    # rectangular DIA (a grid-hierarchy P) is left alone
    rect = DiaMatrix(
        data=D.data[:, : A.shape[0] // 2], offsets=D.offsets,
        shape=(A.shape[0] // 2, A.shape[0]), nnz=D.nnz,
    )
    assert prepad_pallas(rect) is rect
    # idempotent
    assert prepad_pallas(Dp).data.shape == Dp.data.shape


def test_prehalo_kernel_interpret():
    """The pre-haloed distributed kernel matches the XLA shift path
    (interpret mode, asymmetric offsets, H > 0)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from amgcl_tpu.ops.formats import DiaMatrix
    from amgcl_tpu.ops.pallas_spmv import spmv_dia_prehalo_pallas
    from amgcl_tpu.ops.spmv import _spmv_dia

    n = 300
    A = sp.diags([2.0, -1.0, -0.5, 0.25],
                 [0, -1, 7, -13], shape=(n, n)).tocsr()
    M = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    H = max(max(M.offsets), -min(M.offsets))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    x_ext = jnp.pad(x, (H, H))
    y = spmv_dia_prehalo_pallas(M.data, M.offsets, x_ext, H, n,
                                interpret=True)
    ref = _spmv_dia(M, x)
    assert float(abs(y - ref).max()) < 1e-5


def test_prehalo_viability_guard():
    from amgcl_tpu.ops.pallas_spmv import prehalo_viable

    assert prehalo_viable(7, 22528)          # the 150-cube slab case
    assert not prehalo_viable(7, 3_000_000)  # plane bigger than VMEM
    assert not prehalo_viable(400, 128)      # too many diagonals


@pytest.mark.parametrize("n,tile", [(12, 512), (10, 256)])
def test_pallas_dia_padded_matches(n, tile):
    """The padded-layout kernel (persistent tile-multiple vectors, zero
    guard zones instead of per-call pad/unpad copies) matches the plain
    SpMV on the live region and keeps the pad region zero."""
    from amgcl_tpu.ops.pallas_spmv import spmv_dia_padded

    A, _ = poisson3d(n)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    N = A.shape[0]
    n_al = -(-N // tile) * tile
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(N), jnp.float32
    )
    xp = jnp.pad(x, (0, n_al - N))
    y = spmv_dia_padded(D, xp, tile=tile, interpret=True)
    assert y.shape == (n_al,)
    np.testing.assert_allclose(
        np.asarray(y[:N]), np.asarray(spmv(D, x)), rtol=1e-6, atol=1e-6
    )
    assert np.all(np.asarray(y[N:]) == 0.0)


def test_pallas_dia_padded_wide_offsets():
    """2D Poisson (wide halo, several tiles) through the padded kernel."""
    from amgcl_tpu.ops.pallas_spmv import spmv_dia_padded

    A, _ = poisson2d(40)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    N = A.shape[0]
    tile = 256
    n_al = -(-N // tile) * tile
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(N), jnp.float32
    )
    xp = jnp.pad(x, (0, n_al - N))
    y = spmv_dia_padded(D, xp, tile=tile, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y[:N]), np.asarray(spmv(D, x)), rtol=1e-5, atol=1e-5
    )


def test_padded_layout_spmv_dispatch_cpu():
    """spmv() on a padded vector preserves the layout (CPU fallback
    slice/compute/pad — the plumbing the grid solve rides in tests)."""
    A, _ = poisson3d(8)
    D = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    N = A.shape[0]
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal(N), jnp.float32
    )
    xp = jnp.pad(x, (0, 1024 - N))
    y = spmv(D, xp)
    assert y.shape == xp.shape
    np.testing.assert_allclose(
        np.asarray(y[:N]), np.asarray(spmv(D, x)), rtol=1e-6, atol=1e-6
    )
    assert np.all(np.asarray(y[N:]) == 0.0)
