"""Complex-valued systems as equivalent real formulations.

Reference: amgcl/adapter/complex.hpp — a complex system (K + iM)(x+iy) =
(b+ic) is solved as the 2×2-real interleaved form
[[K, -M], [M, K]] per entry, which preserves sparsity structure
(each complex entry becomes a 2×2 block, so block-valued solvers apply).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def complex_to_real(A: sp.spmatrix, rhs=None):
    """Interleaved 2x2-real equivalent: returns (A_real, rhs_real)."""
    A = sp.csr_matrix(A)
    re, im = A.real.tocoo(), A.imag.tocoo()
    rows, cols, vals = [], [], []
    # each complex entry (i,j) = a+bi contributes the 2x2 block
    # [[a, -b], [b, a]] at (2i, 2j)
    C = A.tocoo()
    a, b = C.data.real, C.data.imag
    r2, c2 = 2 * C.row, 2 * C.col
    rows = np.concatenate([r2, r2, r2 + 1, r2 + 1])
    cols = np.concatenate([c2, c2 + 1, c2, c2 + 1])
    vals = np.concatenate([a, -b, b, a])
    Ar = sp.coo_matrix(
        (vals, (rows, cols)), shape=(2 * A.shape[0], 2 * A.shape[1])
    ).tocsr()
    Ar.sum_duplicates()
    if rhs is None:
        return Ar, None
    rhs = np.asarray(rhs)
    br = np.empty(2 * len(rhs))
    br[0::2] = rhs.real
    br[1::2] = rhs.imag
    return Ar, br


def real_to_complex(x):
    """Map an interleaved real solution back to complex."""
    x = np.asarray(x)
    return x[0::2] + 1j * x[1::2]
