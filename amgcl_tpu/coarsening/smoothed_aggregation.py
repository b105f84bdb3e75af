"""Smoothed aggregation coarsening.

Reference: amgcl/coarsening/smoothed_aggregation.hpp:56-242.  The tentative
operator is improved by one damped-Jacobi smoothing step on the *filtered*
matrix A_F (strong off-diagonal entries kept; weak ones folded into the
diagonal):

    P = (I - omega * D_F^{-1} A_F) P_tent,
    omega = relax * 2/3                      (default), or
    omega = relax * (4/3) / rho(D^{-1}A)     when estimating spectral radius.

eps_strong is halved on each successive level, exactly as the reference
does (smoothed_aggregation.hpp:139).  All of this runs on the host in
scipy (the reference also does setup on the CPU, amgcl/amg.hpp:355-360).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .aggregates import pointwise_aggregates, Aggregates
from .tentative import tentative_prolongation


@dataclasses.dataclass
class SmoothedAggregation:
    """Stateful coarsening policy (eps_strong decays per level)."""

    eps_strong: float = 0.08
    relax: float = 1.0
    estimate_spectral_radius: bool = False
    power_iters: int = 0
    block_size: int = 1
    nullspace: np.ndarray | None = None   # (n, ncols) near-nullspace or None
    aggregates: str = "greedy"            # or "pmis" (parallel MIS sweep)

    def transfer_operators(self, A: sp.csr_matrix):
        n = A.shape[0]
        aggr = pointwise_aggregates(
            A, self.eps_strong, self.block_size, method=self.aggregates
        )
        self.eps_strong *= 0.5

        P_tent, B_coarse = tentative_prolongation(
            n, aggr, self.nullspace, self.block_size
        )
        self.nullspace = B_coarse

        omega = self.relax
        if self.estimate_spectral_radius:
            omega *= (4.0 / 3.0) / spectral_radius(A, self.power_iters)
        else:
            omega *= 2.0 / 3.0

        S = filtered_smoother(A, aggr, omega)
        P = (S @ P_tent).tocsr()
        P.sum_duplicates()
        R = P.T.tocsr()
        return P, R

    def coarse_operator(self, A, P, R):
        return galerkin(A, P, R)


def filtered_smoother(
    A: sp.csr_matrix, aggr: Aggregates, omega: float
) -> sp.csr_matrix:
    """(I - omega D_F^{-1} A_F) as a scipy matrix.

    The filtered diagonal is a_ii plus all *weak* off-diagonal entries
    (smoothed_aggregation.hpp:195-201); strong off-diagonals are scaled by
    -omega/d_F; the diagonal entry becomes (1 - omega)."""
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    is_dia = A.indices == rows
    keep = aggr.strong | is_dia

    # Filtered diagonal: sum of diagonal + weak entries per row.
    weak_vals = np.where(~keep, A.data, 0.0)
    dia_F = A.diagonal() + np.bincount(rows, weights=weak_vals, minlength=n)
    inv_dF = np.where(dia_F != 0, 1.0 / np.where(dia_F == 0, 1.0, dia_F), 0.0)

    vals = np.where(
        is_dia,
        1.0 - omega,
        np.where(keep, -omega * inv_dF[rows] * A.data, 0.0),
    )
    # Copy the structure arrays: eliminate_zeros() compacts in place and must
    # not corrupt the caller's matrix.
    S = sp.csr_matrix(
        (vals, A.indices.copy(), A.indptr.copy()), shape=A.shape
    )
    S.eliminate_zeros()
    return S


def galerkin(A, P, R) -> sp.csr_matrix:
    """Ac = R (A P) (reference: amgcl/coarsening/detail/galerkin.hpp:41-47)."""
    Ac = (R @ (A @ P)).tocsr()
    Ac.sum_duplicates()
    return Ac


def spectral_radius(A: sp.csr_matrix, power_iters: int = 0) -> float:
    """rho(D^{-1} A): Gershgorin bound, or power iteration when
    power_iters > 0 (reference: amgcl/backend/builtin.hpp:781)."""
    n = A.shape[0]
    dia = A.diagonal()
    inv_d = np.where(dia != 0, 1.0 / np.where(dia == 0, 1.0, dia), 0.0)
    if power_iters <= 0:
        rows = np.repeat(np.arange(n), np.diff(A.indptr))
        radius = np.bincount(rows, weights=np.abs(A.data), minlength=n)
        return float(np.max(np.abs(inv_d) * radius))
    rng = np.random.default_rng(0)
    b = rng.random(n)
    b /= np.linalg.norm(b)
    rho = 1.0
    for _ in range(power_iters):
        w = inv_d * (A @ b)
        rho = float(b @ w)
        nw = np.linalg.norm(w)
        if nw == 0:
            break
        b = w / nw
    return abs(rho)
