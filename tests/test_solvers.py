"""Krylov solver suite tests (the reference's combinatorial sweep role,
tests/test_solver.hpp:120-208): every solver must converge on SPD Poisson
with and without AMG; nonsymmetric solvers on convection-diffusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import scipy.sparse as sp

from amgcl_tpu.models.poisson import poisson2d, convection_diffusion2d
from amgcl_tpu.ops.formats import SparseMatrix
from amgcl_tpu.solver import SOLVERS


ALL_SOLVERS = sorted(SOLVERS)


@pytest.fixture(scope="module")
def spd_problem():
    A, rhs = poisson2d(16)
    return A, SparseMatrix.from_scipy(A, dtype=jnp.float64), jnp.asarray(rhs)


@pytest.fixture(scope="module")
def nonsym_problem():
    A, rhs = convection_diffusion2d(16)
    return A, SparseMatrix.from_scipy(A, dtype=jnp.float64), jnp.asarray(rhs)


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_unpreconditioned_spd(spd_problem, name):
    if name == "preonly":
        pytest.skip("preonly needs a preconditioner")
    A, Ad, rhs = spd_problem
    fn = SOLVERS[name]
    maxiter = 20000 if name == "richardson" else 300
    kw = {"damping": 0.22} if name == "richardson" else {}
    x, info = fn(Ad, None, rhs, tol=1e-8, maxiter=maxiter, **kw)
    r = rhs - jnp.asarray(A @ np.asarray(x))
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert rel < 1e-6, f"{name}: rel={rel}, iters={int(info.iters)}"


@pytest.mark.parametrize("name", ["bicgstab", "bicgstabl", "gmres", "fgmres", "lgmres", "idrs"])
def test_nonsymmetric(nonsym_problem, name):
    A, Ad, rhs = nonsym_problem
    fn = SOLVERS[name]
    x, info = fn(Ad, None, rhs, tol=1e-8, maxiter=300)
    r = rhs - jnp.asarray(A @ np.asarray(x))
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert rel < 1e-6, f"{name}: rel={rel}, iters={int(info.iters)}"


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_solvers_jittable(spd_problem, name):
    """Every solver must be jittable with the matrix as a pytree arg."""
    A, Ad, rhs = spd_problem
    fn = SOLVERS[name]

    @jax.jit
    def run(Ad, rhs):
        return fn(Ad, None, rhs, tol=1e-6, maxiter=50)

    x, info = run(Ad, rhs)
    assert np.isfinite(float(info.error))


def test_x0_respected(spd_problem):
    A, Ad, rhs = spd_problem
    x_exact = sp.linalg.spsolve(A.tocsc(), np.asarray(rhs))
    x, info = SOLVERS["cg"](
        Ad, None, rhs, jnp.asarray(x_exact), tol=1e-8, maxiter=50
    )
    assert int(info.iters) <= 1


def test_refine_mixed_precision():
    """Iterative refinement reaches true-f64 1e-8 residuals with f32
    inner solves (a pure f32 Krylov solve stalls near 1e-7)."""
    import jax.numpy as jnp
    from amgcl_tpu import make_solver
    from amgcl_tpu.models.poisson import poisson3d

    A, rhs = poisson3d(16)
    S = make_solver(A, solver="refine", tol=1e-10, maxiter=30,
                    inner="cg", inner_tol=1e-4, inner_maxiter=50)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < 1e-9, rel

    S32 = make_solver(A, solver="cg", tol=1e-10, maxiter=200,
                      solver_dtype=jnp.float32)
    x32, _ = S32(rhs.astype(np.float32))
    r32 = rhs - A @ np.asarray(x32, dtype=np.float64)
    assert np.linalg.norm(r32) / np.linalg.norm(rhs) > rel  # f32 stalls
