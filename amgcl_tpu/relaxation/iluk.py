"""ILU(k) — level-of-fill incomplete LU (reference:
amgcl/relaxation/iluk.hpp:48) and ILU(p) with the pattern of A^p
(amgcl/relaxation/ilup.hpp:51).

Both reduce to "compute a fill pattern, then run ILU0 on it": the fill
pattern of ILU(k) is built symbolically on the host (scipy boolean
products with level tracking), after which the numeric factorization and
the TPU-side Jacobi triangular solves are shared with ilu0.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from .ilu0 import ILU0, ILUState, ilu0_factor_host


def iluk_pattern(A: sp.csr_matrix, k: int) -> sp.csr_matrix:
    """Symbolic ILU(k) fill pattern via level-of-fill propagation.

    Levels: lev(a_ij) = 0 for original entries; fill entry (i,j) created
    through k gets lev = lev(i,k) + lev(k,j) + 1; kept while lev <= k.
    Computed with k rounds of boolean products (equivalent pattern)."""
    if k <= 0:
        P = sp.csr_matrix(A.copy())
        P.data = np.ones_like(P.data)
        return P
    # level matrix: store lev+1 so zero means "absent"
    n = A.shape[0]
    cur = sp.csr_matrix(
        (np.ones_like(A.data), A.indices.copy(), A.indptr.copy()), shape=A.shape
    )
    pattern = cur.copy()
    L = sp.tril(cur, k=-1, format="csr")
    U = sp.triu(cur, k=0, format="csr")
    for _ in range(k):
        fill = (L @ U).tocsr()
        fill.data = np.ones_like(fill.data)
        pattern = (pattern + fill).tocsr()
        pattern.data = np.ones_like(pattern.data)
        L = sp.tril(pattern, k=-1, format="csr")
        U = sp.triu(pattern, k=0, format="csr")
    return pattern


@dataclasses.dataclass
class ILUK:
    k: int = 1
    damping: float = 1.0
    jacobi_iters: int = 2

    def setup(self, A_host: sp.csr_matrix, A_dev) -> ILUState:
        A = sp.csr_matrix(A_host)
        A.sort_indices()
        pattern = iluk_pattern(A, self.k)
        # embed A's values in the extended pattern (fill entries start 0)
        Aext = sp.csr_matrix(
            (np.zeros_like(pattern.data), pattern.indices, pattern.indptr),
            shape=A.shape,
        )
        Aext = (Aext + A).tocsr()
        # ensure the pattern is preserved even where A has explicit zeros
        Aext.sort_indices()
        return ILU0(
            damping=self.damping, jacobi_iters=self.jacobi_iters
        ).setup(Aext, A_dev)


@dataclasses.dataclass
class ILUP:
    """ILU with the sparsity pattern of A^(p+1) (reference ilup.hpp)."""

    p: int = 1
    damping: float = 1.0
    jacobi_iters: int = 2

    def setup(self, A_host: sp.csr_matrix, A_dev) -> ILUState:
        A = sp.csr_matrix(A_host)
        A.sort_indices()
        pat = sp.csr_matrix(
            (np.ones_like(A.data), A.indices.copy(), A.indptr.copy()),
            shape=A.shape,
        )
        cur = pat.copy()
        for _ in range(self.p):
            cur = (cur @ pat).tocsr()
            cur.data = np.ones_like(cur.data)
        Aext = sp.csr_matrix(
            (np.zeros_like(cur.data), cur.indices, cur.indptr), shape=A.shape
        )
        Aext = (Aext + A).tocsr()
        Aext.sort_indices()
        return ILU0(
            damping=self.damping, jacobi_iters=self.jacobi_iters
        ).setup(Aext, A_dev)
