"""Energy-minimizing smoothed aggregation.

Capability parity with the reference (amgcl/coarsening/smoothed_aggr_emin.
hpp:54): tentative prolongation improved with *per-coarse-column* damping
factors that minimize the energy of the smoothed basis functions:

    AP    = A_F P_tent,      ADAP = A_F D_F^{-1} AP
    omega_j = <AP_j, ADAP_j> / <ADAP_j, ADAP_j>      (clipped at 0)
    P = P_tent − D_F^{-1} AP Ω,   R = P_tentᵀ − Ω P_tentᵀ A_F D_F^{-1}

with A_F the same strong-connection-filtered matrix (weak entries folded
into the diagonal) as plain smoothed aggregation.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .aggregates import pointwise_aggregates
from .tentative import tentative_prolongation
from .smoothed_aggregation import galerkin


def _filtered(A: sp.csr_matrix, strong: np.ndarray):
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    is_dia = A.indices == rows
    keep = strong | is_dia
    weak_vals = np.where(~keep, A.data, 0.0)
    dia = A.diagonal() + np.bincount(rows, weights=weak_vals, minlength=n)
    vals = np.where(is_dia, dia[rows], np.where(strong, A.data, 0.0))
    Af = sp.csr_matrix((vals, A.indices.copy(), A.indptr.copy()), shape=A.shape)
    Af.eliminate_zeros()
    return Af, dia


@dataclasses.dataclass
class SmoothedAggrEMin:
    eps_strong: float = 0.08
    block_size: int = 1
    nullspace: np.ndarray | None = None

    def transfer_operators(self, A: sp.csr_matrix):
        n = A.shape[0]
        aggr = pointwise_aggregates(A, self.eps_strong, self.block_size)
        self.eps_strong *= 0.5
        P_tent, B_coarse = tentative_prolongation(
            n, aggr, self.nullspace, self.block_size
        )
        self.nullspace = B_coarse

        Af, dia = _filtered(A, aggr.strong)
        dia_safe = np.where(dia != 0, dia, 1.0)
        Dinv = sp.diags(1.0 / dia_safe)

        AP = sp.csr_matrix(Af @ P_tent)
        ADAP = sp.csr_matrix(Af @ (Dinv @ AP))

        num = np.asarray(AP.multiply(ADAP).sum(axis=0)).ravel()
        den = np.asarray(ADAP.multiply(ADAP).sum(axis=0)).ravel()
        omega = np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)
        omega = np.maximum(omega, 0.0)
        Om = sp.diags(omega)

        P = sp.csr_matrix(P_tent - Dinv @ (AP @ Om))
        P.sum_duplicates()
        R = sp.csr_matrix(P_tent.T - Om @ (P_tent.T @ (Af @ Dinv)))
        R.sum_duplicates()
        return P, R

    def coarse_operator(self, A, P, R):
        return galerkin(A, P, R)
