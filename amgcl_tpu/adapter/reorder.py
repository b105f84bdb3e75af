"""Matrix reordering adapter.

Reference: amgcl/adapter/reorder.hpp:48-211 with the default
Cuthill–McKee ordering (amgcl/reorder/cuthill_mckee.hpp:79).  On TPU the
reorder adapter doubles as a performance transform: reducing bandwidth
shrinks the diagonal-offset set, letting levels qualify for the DIA
(shift-only) format instead of the gather-bound ELL path.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee


def cuthill_mckee(A: sp.csr_matrix, symmetric: bool = True) -> np.ndarray:
    """Permutation vector p such that A[p][:, p] has reduced bandwidth."""
    return np.asarray(
        reverse_cuthill_mckee(sp.csr_matrix(A), symmetric_mode=symmetric)
    )


class ReorderedProblem:
    """Wraps a matrix with a (default CM) reordering; forward/backward maps
    for vectors mirror the reference's adapter API."""

    def __init__(self, A: sp.csr_matrix, perm: np.ndarray | None = None):
        A = sp.csr_matrix(A)
        self.perm = cuthill_mckee(A) if perm is None else np.asarray(perm)
        self.inv = np.empty_like(self.perm)
        self.inv[self.perm] = np.arange(len(self.perm))
        self.A = sp.csr_matrix(A[self.perm][:, self.perm])
        self.A.sort_indices()

    def forward(self, v):
        """Original ordering → reordered."""
        return np.asarray(v)[self.perm]

    def backward(self, v):
        """Reordered → original ordering."""
        return np.asarray(v)[self.inv]
