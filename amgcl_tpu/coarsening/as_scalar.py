"""as_scalar — use any scalar coarsening with block-valued systems.

Capability parity with the reference (amgcl/coarsening/as_scalar.hpp:45):
compress the block system to its pointwise (block-norm) scalar matrix, run
the wrapped coarsening there, then expand the transfer operators back to
block form (kron with I_b), so e.g. Ruge–Stüben — scalar-only in the
reference too — applies to block problems.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .aggregates import pointwise_matrix
from .smoothed_aggregation import galerkin


@dataclasses.dataclass
class AsScalar:
    base: object
    block_size: int = 1

    def transfer_operators(self, A: sp.csr_matrix):
        b = self.block_size
        if b == 1:
            return self.base.transfer_operators(A)
        Ap = pointwise_matrix(sp.csr_matrix(A), b)
        # Strength semantics expect signed diagonals; the pointwise matrix
        # is all-positive norms — flip off-diagonal sign so "strong negative
        # coupling" logic (Ruge-Stuben) still applies.
        n = Ap.shape[0]
        rows = np.repeat(np.arange(n), np.diff(Ap.indptr))
        offd = Ap.indices != rows
        Ap = sp.csr_matrix(
            (np.where(offd, -Ap.data, Ap.data), Ap.indices, Ap.indptr),
            shape=Ap.shape,
        )
        Pp, Rp = self.base.transfer_operators(Ap)
        I = sp.eye(b, format="csr")
        P = sp.csr_matrix(sp.kron(Pp, I))
        R = sp.csr_matrix(sp.kron(Rp, I))
        return P, R

    def coarse_operator(self, A, P, R):
        if hasattr(self.base, "coarse_operator") and self.block_size == 1:
            return self.base.coarse_operator(A, P, R)
        return galerkin(A, P, R)
