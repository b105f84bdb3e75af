"""Robustness sweep: odd sizes, random SPD patterns, extreme scaling,
tiny systems — the sanity battery that catches format-selection and
padding edge cases (fixed seeds, CPU)."""

import numpy as np
import pytest
import scipy.sparse as sp

from amgcl_tpu import make_solver


def _random_spd(n, density, seed, shift=1e-2):
    rng = np.random.default_rng(seed)
    B = sp.random(n, n, density=density, random_state=rng, format="csr")
    A = (B @ B.T).tocsr()
    A = A + shift * sp.eye(n) + sp.diags(np.asarray(abs(A).sum(axis=1)).ravel())
    A = sp.csr_matrix(A)
    A.sort_indices()
    return A


@pytest.mark.parametrize("n,density,seed", [
    (97, 0.05, 0),      # prime size, moderately dense
    (256, 0.01, 1),
    (513, 0.004, 2),    # odd size
])
def test_random_spd(n, density, seed):
    A = _random_spd(n, density, seed)
    rhs = np.ones(n)
    S = make_solver(A, solver="cg", tol=1e-8, maxiter=600)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


def test_tiny_systems():
    for n in (1, 2, 3, 5):
        A = sp.csr_matrix(sp.diags(np.arange(1.0, n + 1)))
        rhs = np.ones(n)
        S = make_solver(A, solver="cg", tol=1e-10, maxiter=50)
        x, info = S(rhs)
        assert np.allclose(np.asarray(x) * np.arange(1.0, n + 1), 1.0,
                           atol=1e-8)


def test_extreme_scaling():
    """Entries spanning 12 orders of magnitude: the f32 hierarchy must
    still precondition an f64-accurate solve (with diagonal scaling)."""
    from amgcl_tpu.adapter import ScaledProblem
    from amgcl_tpu.models.poisson import poisson2d

    A, rhs = poisson2d(24)
    d = np.logspace(-6, 6, A.shape[0])
    D = sp.diags(d)
    As = sp.csr_matrix(D @ A @ D)
    bs = d * rhs

    prob = ScaledProblem(As)
    S = make_solver(prob.A, solver="cg", tol=1e-8, maxiter=300)
    x, info = S(prob.scale_rhs(bs))
    xs = prob.unscale_solution(np.asarray(x, dtype=np.float64))
    r = bs - As @ xs
    assert np.linalg.norm(r) / np.linalg.norm(bs) < 1e-6


def test_unsymmetric_convection():
    from amgcl_tpu.models.poisson import convection_diffusion2d

    A, rhs = convection_diffusion2d(24)
    S = make_solver(A, solver="bicgstab", tol=1e-8, maxiter=300)
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7
