"""Symmetric diagonal scaling adapter.

Reference: amgcl/adapter/scaled_problem.hpp — solve
(D^-1/2 A D^-1/2)(D^1/2 x) = D^-1/2 b instead of A x = b.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


class ScaledProblem:
    def __init__(self, A: sp.csr_matrix):
        A = sp.csr_matrix(A)
        dia = A.diagonal()
        if (dia <= 0).any():
            # fall back to |diag| to keep the scaling real
            dia = np.abs(dia)
            dia[dia == 0] = 1.0
        self.s = 1.0 / np.sqrt(dia)
        Dh = sp.diags(self.s)
        self.A = sp.csr_matrix(Dh @ A @ Dh)
        self.A.sort_indices()

    def scale_rhs(self, b):
        return np.asarray(b) * self.s

    def unscale_solution(self, y):
        return np.asarray(y) * self.s
