"""Deflated solver — two-level deflation with user-supplied vectors.

Capability parity with the reference deflated_solver
(amgcl/deflated_solver.hpp:45: projected Krylov with deflation vectors Z,
dense factorization of E = Zᵀ A Z) and, over a device mesh, with
mpi::subdomain_deflation (amgcl/mpi/subdomain_deflation.hpp:54-610 —
there Z holds one constant vector per subdomain; here `constant_deflation`
builds the same per-shard indicator vectors).

Standard two-level deflated PCG (Vuik/Nicolaides):
  Q = Z E^{-1} Zᵀ,  P = I − A Q
  x = Q b + Pᵀ x̃  where x̃ solves the projected system P A x̃ = P b
Dense E work is MXU-friendly (E is k×k, Z applications are tall
matmuls).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from ..ops.formats import from_scipy_auto
from ..ops.spmv import spmv
from ..solver import make_solver_fn


def constant_deflation(n: int, nparts: int) -> np.ndarray:
    """Piecewise-constant deflation basis: indicator of each of nparts
    contiguous row blocks (the reference's constant_deflation over
    subdomains)."""
    Z = np.zeros((n, nparts))
    bounds = np.linspace(0, n, nparts + 1).astype(int)
    for k in range(nparts):
        Z[bounds[k] : bounds[k + 1], k] = 1.0
    return Z


class DeflatedSolver:
    """make_solver + deflation: solve(rhs) runs deflated preconditioned
    Krylov and returns (x, info)."""

    def __init__(
        self,
        A,
        Z,
        solver: str = "cg",
        precond: str = "amg",
        solver_dtype=jnp.float64,
        **kw,
    ):
        from ..api import Solver

        A = sp.csr_matrix(A)
        self.inner = Solver(
            A, solver=solver, precond=precond, solver_dtype=solver_dtype, **kw
        )
        Z = np.asarray(Z, dtype=np.float64)
        AZ = A @ Z
        E = Z.T @ AZ
        self.Z = jnp.asarray(Z, dtype=solver_dtype)
        self.AZ = jnp.asarray(AZ, dtype=solver_dtype)
        self.Einv = jnp.asarray(np.linalg.inv(E), dtype=solver_dtype)
        self.A_dev = self.inner.A_dev
        self.solver_fn = make_solver_fn(solver)
        self.kw = {
            k: v for k, v in kw.items()
            if k in ("tol", "abstol", "maxiter", "M", "damping")
        }

    def _Q(self, v):
        return self.Z @ (self.Einv @ (self.Z.T @ v))

    def _P(self, v):
        """P v = v − A Z E^{-1} Zᵀ v."""
        return v - self.AZ @ (self.Einv @ (self.Z.T @ v))

    def __call__(self, rhs, x0=None):
        dt = self.A_dev.dtype
        b = jnp.asarray(rhs, dtype=dt)

        Aop = lambda v: self._P(spmv(self.A_dev, v))
        precond = self.inner.precond
        from .amg import AMG, amg_apply

        if isinstance(precond, AMG):
            Pop = lambda r: amg_apply(precond.levels, r, precond.prm)
        else:
            Pop = precond.apply

        Pb = self._P(b)
        xt, info = self.solver_fn(Aop, Pop, Pb, x0, **self.kw)
        # x = Q b + Pᵀ x̃;  Pᵀ y = y − Z E^{-1} (AZ)ᵀ y
        x = self._Q(b) + (xt - self.Z @ (self.Einv @ (self.AZ.T @ xt)))
        return x, info
