"""Non-smoothed aggregation coarsening.

Reference: amgcl/coarsening/aggregation.hpp (P = tentative prolongation,
coarse operator is the *scaled* Galerkin product Ac = (R A P)/over_interp,
over_interp defaulting to 1.5 for scalar and 2.0 for block values)."""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .aggregates import pointwise_aggregates
from .tentative import tentative_prolongation


@dataclasses.dataclass
class Aggregation:
    eps_strong: float = 0.08
    over_interp: float | None = None   # default depends on block size
    block_size: int = 1
    nullspace: np.ndarray | None = None

    def transfer_operators(self, A: sp.csr_matrix):
        n = A.shape[0]
        aggr = pointwise_aggregates(A, self.eps_strong, self.block_size)
        P, B_coarse = tentative_prolongation(
            n, aggr, self.nullspace, self.block_size
        )
        self.nullspace = B_coarse
        return P.tocsr(), P.T.tocsr()

    def coarse_operator(self, A, P, R):
        over = self.over_interp
        if over is None:
            over = 1.5 if self.block_size == 1 else 2.0
        Ac = (R @ (A @ P)).tocsr() * (1.0 / over)
        Ac.sum_duplicates()
        return Ac
