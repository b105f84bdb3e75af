"""Device-side (probed) hierarchy construction must agree with the host
scipy Galerkin path and converge identically."""

import numpy as np
import pytest
import jax.numpy as jnp

import scipy.sparse as sp

from amgcl_tpu.models.poisson import poisson2d, poisson3d
from amgcl_tpu.ops.formats import DiaMatrix
from amgcl_tpu.coarsening.grid_aggregation import GridAggregation, GridTransfer
from amgcl_tpu.precond.amg import AMG
from amgcl_tpu.precond.grid_setup import (
    GridAMG, decompose_offsets, dia_filtered_smoother, probe_coarse_operator,
)
from amgcl_tpu import make_solver


def test_decompose_offsets():
    dims = (10, 12, 14)
    sy, sz = 12 * 14, 14
    offs = [0, 1, -1, sz, -sz, sy, -sy, sy + sz + 1, -sy - 1]
    comps = decompose_offsets(offs, dims)
    for off, c in zip(offs, comps):
        assert off == c[0] * sy + c[1] * sz + c[2], (off, c)


def test_dia_smoother_matches_host():
    A, _ = poisson2d(12)
    from amgcl_tpu.coarsening.aggregates import strong_connections, Aggregates
    from amgcl_tpu.coarsening.smoothed_aggregation import filtered_smoother

    strong = strong_connections(A, 0.08)
    aggr = Aggregates(count=1, id=np.zeros(A.shape[0]), strong=strong)
    S_host = filtered_smoother(A, aggr, 2.0 / 3.0)

    Ad = DiaMatrix.from_scipy(A, dtype=jnp.float64)
    S_dev = dia_filtered_smoother(Ad, 2.0 / 3.0, 0.08)
    diff = abs(S_dev.to_scipy() - S_host).max()
    assert diff < 1e-12


@pytest.mark.parametrize("n,dims", [(12, (12, 12)), (6, (6, 6, 6)), (7, (7, 7))])
def test_probed_galerkin_matches_scipy(n, dims):
    A, _ = poisson2d(n) if len(dims) == 2 else poisson3d(n)
    # host path
    c = GridAggregation(dims=dims)
    P, R = c.transfer_operators(A)
    Ac_host = c.coarse_operator(A, P, R)
    # device path
    from amgcl_tpu.precond.amg import AMGParams

    amg = GridAMG(A, dims, dtype=jnp.float64,
                  params=AMGParams(coarse_enough=10, max_levels=2))
    Ac_dev = amg.levels[1].A.to_scipy()
    diff = abs(Ac_dev - Ac_host)
    err = diff.max() if diff.nnz else 0.0
    assert err < 1e-10, err


def test_grid_amg_converges_same():
    n = 16
    A, rhs = poisson3d(n)
    S_host = make_solver(
        A, solver="cg", tol=1e-8, maxiter=100,
        coarsening=GridAggregation(dims=(n, n, n)),
    )
    S_dev = make_solver(
        A, solver="cg", tol=1e-8, maxiter=100,
        coarsening=GridAggregation(dims=(n, n, n)), device_setup=True,
    )
    x1, i1 = S_host(rhs)
    x2, i2 = S_dev(rhs)
    assert int(i1.iters) == int(i2.iters)
    r = rhs - A @ np.asarray(x2, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


@pytest.mark.parametrize("smoother", ["damped_jacobi", "chebyshev"])
def test_grid_amg_device_smoothers(smoother):
    from amgcl_tpu.relaxation import make_smoother

    n = 12
    A, rhs = poisson3d(n)
    S = make_solver(
        A, solver="cg", tol=1e-8, maxiter=100,
        coarsening=GridAggregation(dims=(n, n, n)), device_setup=True,
        relaxation=make_smoother(smoother),
    )
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


def test_grid_rebuild_matches_fresh():
    """Device-side GridAMG.rebuild (amg::rebuild role): reuse transfers,
    re-probe coefficients — a rebuilt hierarchy must solve a scaled
    problem as well as a freshly built one."""
    import jax.numpy as jnp
    from amgcl_tpu import make_solver
    from amgcl_tpu.coarsening.grid_aggregation import GridAggregation
    from amgcl_tpu.models.poisson import poisson3d

    n = 14
    A, rhs = poisson3d(n)
    S = make_solver(A, solver="cg", tol=1e-8, maxiter=100, device_setup=True,
                    coarsening=GridAggregation(dims=(n, n, n)))
    _, i0 = S(rhs)

    A2 = (2.5 * A).tocsr()
    S.rebuild(A2)
    x2, i2 = S(rhs)
    r = rhs - A2 @ np.asarray(x2, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7
    # pure scaling leaves the preconditioned spectrum unchanged
    assert abs(int(i2.iters) - int(i0.iters)) <= 1

    # a genuinely different operator (anisotropy) still converges
    import scipy.sparse as sp
    A3 = (A + sp.diags(np.linspace(0.0, 3.0, A.shape[0]))).tocsr()
    S.rebuild(A3)
    x3, i3 = S(rhs)
    r3 = rhs - A3 @ np.asarray(x3, dtype=np.float64)
    assert np.linalg.norm(r3) / np.linalg.norm(rhs) < 1e-7
