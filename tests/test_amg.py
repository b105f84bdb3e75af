"""End-to-end AMG tests: the minimum slice of SURVEY.md §7 stage 3 —
setup → V-cycle → preconditioned Krylov on 3D Poisson, matching the
reference test strategy (combinatorial sweep at 1e-4, tests/test_solver.hpp)
plus convergence-class checks against the tutorial baselines."""

import numpy as np
import pytest
import jax.numpy as jnp

from amgcl_tpu.models.poisson import poisson3d, poisson2d
from amgcl_tpu import make_solver
from amgcl_tpu.precond.amg import AMG, AMGParams


@pytest.fixture(scope="module")
def poisson16():
    return poisson3d(16)


def _check(S, A, rhs, tol=1e-4):
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < tol, f"relative residual {rel} (iters {int(info.iters)})"
    return int(info.iters), rel


def test_cg_amg_poisson(poisson16):
    A, rhs = poisson16
    S = make_solver(A, solver="cg", tol=1e-8, maxiter=100)
    iters, rel = _check(S, A, rhs, tol=1e-7)
    # Reference class: ~12-24 iterations for SA+SPAI0 on Poisson
    # (docs/tutorial/poisson3Db.rst:37-63).
    assert iters <= 30


def test_hierarchy_shape(poisson16):
    A, _ = poisson16
    amg = AMG(A)
    assert len(amg.levels) >= 2
    nnz0 = amg.levels[0].A.nnz
    total = sum(l.A.nnz for l in amg.levels)
    assert total / nnz0 < 2.5  # operator complexity sane
    r = repr(amg)
    assert "Operator complexity" in r


@pytest.mark.parametrize("solver", ["cg", "bicgstab", "gmres", "fgmres"])
def test_solver_sweep_amg(poisson16, solver):
    A, rhs = poisson16
    S = make_solver(A, solver=solver, tol=1e-6, maxiter=100)
    _check(S, A, rhs, tol=1e-4)


@pytest.mark.parametrize(
    "smoother",
    ["damped_jacobi", "spai0", "chebyshev", "gauss_seidel", "ilu0",
     "ilu0_chow_patel", "iluk", "ilup", "ilut"],
)
def test_smoother_sweep(poisson16, smoother):
    from amgcl_tpu.relaxation import make_smoother

    A, rhs = poisson16
    S = make_solver(
        A, solver="cg", tol=1e-6, maxiter=100,
        relaxation=make_smoother(smoother),
    )
    _check(S, A, rhs, tol=1e-4)


@pytest.mark.parametrize(
    "smoother", ["spai0", "damped_jacobi", "gauss_seidel", "ilu0", "spai1"]
)
def test_single_level_precond(smoother):
    from amgcl_tpu.relaxation import make_smoother

    A, rhs = poisson2d(12)
    S = make_solver(
        A, solver="cg", precond="relaxation", tol=1e-6, maxiter=500,
        relaxation=make_smoother(smoother),
    )
    _check(S, A, rhs, tol=1e-4)


def test_dummy_precond():
    A, rhs = poisson2d(10)
    S = make_solver(A, solver="cg", precond="dummy", tol=1e-8, maxiter=500)
    _check(S, A, rhs, tol=1e-6)


def test_w_cycle(poisson16):
    A, rhs = poisson16
    S = make_solver(
        A, solver="cg", tol=1e-8, maxiter=100,
        amg_params=AMGParams(ncycle=2),
    )
    iters, _ = _check(S, A, rhs, tol=1e-7)
    assert iters <= 30


def test_rebuild(poisson16):
    A, rhs = poisson16
    S = make_solver(A, solver="cg", tol=1e-8, maxiter=100)
    _check(S, A, rhs, tol=1e-7)
    # Same sparsity, scaled coefficients.
    S.rebuild(A * 2.0)
    x, info = S(rhs)
    r = rhs - 2.0 * (A @ np.asarray(x, dtype=np.float64))
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


def test_block_amg():
    from amgcl_tpu.models.poisson import poisson3d_block

    A, rhs = poisson3d_block(10, block=2)
    S = make_solver(A, solver="cg", block=2, tol=1e-8, maxiter=100)
    _check(S, A, rhs, tol=1e-7)


def test_runtime_config(poisson16):
    from amgcl_tpu import make_solver_from_config

    A, rhs = poisson16
    S = make_solver_from_config(
        A,
        {
            "solver": {"type": "cg", "tol": 1e-8, "maxiter": 100},
            "precond": {
                "class": "amg",
                "coarsening": {"type": "smoothed_aggregation"},
                "relax": {"type": "spai0"},
                "coarse_enough": 500,
            },
        },
    )
    _check(S, A, rhs, tol=1e-7)


def test_runtime_config_unknown_key_rejected(poisson16):
    from amgcl_tpu import make_solver_from_config

    A, _ = poisson16
    with pytest.raises(ValueError, match="unknown parameter"):
        make_solver_from_config(A, {"solver": {"type": "cg", "tolerance": 1}})


def test_nullspace_qr():
    """Nullspace-aware tentative prolongation (constant vector reproduces
    the default behaviour up to scaling)."""
    A, rhs = poisson3d(10)
    from amgcl_tpu.coarsening.smoothed_aggregation import SmoothedAggregation

    B = np.ones((A.shape[0], 1))
    S = make_solver(
        A, solver="cg", tol=1e-8, maxiter=100,
        coarsening=SmoothedAggregation(nullspace=B),
    )
    _check(S, A, rhs, tol=1e-7)


def test_gs_dense_level_jacobi_fallback():
    """A level that colors into > max_colors parts degrades to damped
    Jacobi: pin the warning, the substituted state type, the max_colors
    opt-out, and that the substitute still converges (VERDICT r04 weak #7
    — previously nothing asserted the fallback fires)."""
    import scipy.sparse as sp

    from amgcl_tpu.ops.formats import SparseMatrix
    from amgcl_tpu.ops.spmv import spmv
    from amgcl_tpu.relaxation import apply_standalone
    from amgcl_tpu.relaxation.damped_jacobi import JacobiState
    from amgcl_tpu.relaxation.gauss_seidel import GaussSeidel, GaussSeidelState

    rng = np.random.default_rng(3)
    n = 80
    M = rng.standard_normal((n, n))
    Ad = M @ M.T + 2 * n * np.eye(n)          # dense SPD, diag-dominant-ish
    A = sp.csr_matrix(Ad)
    A_dev = SparseMatrix.from_scipy(A, dtype=jnp.float64)

    with pytest.warns(UserWarning, match="colors on a dense level"):
        st = GaussSeidel().setup(A, A_dev)
    assert isinstance(st, JacobiState)

    # the substituted smoother still reduces the error as a standalone
    rhs = jnp.asarray(rng.standard_normal(n))
    x = None
    for _ in range(30):
        x = apply_standalone(st, A_dev, rhs, x)
    r = rhs - spmv(A_dev, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs)) < 1e-2

    # opting out via max_colors gives true multicolor GS (n colors: dense)
    st2 = GaussSeidel(max_colors=n).setup(A, A_dev)
    assert isinstance(st2, GaussSeidelState)
