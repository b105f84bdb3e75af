"""Fine-grained parallel ILU(0) — Chow & Patel sweeps.

Capability parity with the reference's GPU-oriented variant
(amgcl/relaxation/ilu0_chow_patel.hpp:86): instead of the sequential IKJ
elimination, the factorization is a fixed-point iteration on the ILU
equations, every entry updated independently per sweep —

    L sweep:  l_ij += (a_ij − (L U)_ij) / u_jj       (i > j)
    U sweep:  u_ij += (a_ij − (L U)_ij)              (i <= j)

— and the triangular solves are the same fixed-count Jacobi iterations
used by the whole ILU family here (ilu0.py), which is the reference's
Chow–Patel solve strategy as well.  The sweeps are data-parallel
(residual-form updates sampled on the ILU(0) pattern).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from ..ops.formats import from_scipy_auto
from .ilu0 import ILUState


@dataclasses.dataclass
class ILU0ChowPatel:
    sweeps: int = 3
    damping: float = 1.0
    jacobi_iters: int = 2

    def setup(self, A_host: sp.csr_matrix, A_dev) -> ILUState:
        L, U_strict, inv = chow_patel_factor_host(A_host, self.sweeps)
        dt = A_dev.dtype
        return ILUState(
            L=from_scipy_auto(L, dtype=dt),
            U=from_scipy_auto(U_strict, dtype=dt),
            inv_dia=jnp.asarray(inv, dtype=dt),
            damping=jnp.asarray(self.damping, dtype=dt),
            jacobi_iters=self.jacobi_iters,
            block=getattr(A_dev, "block", 1),
        )


def chow_patel_factor_host(A_host: sp.csr_matrix, sweeps: int):
    """Chow–Patel fixed-point ILU(0) factorization (host scipy sweeps);
    returns (L strict-lower unit-implied, U strict-upper, 1/diag(U))."""
    A = sp.csr_matrix(A_host)
    A.sort_indices()
    dia = A.diagonal()
    dia_safe = np.where(dia != 0, dia, 1.0)

    # Initial guess: l_ij = a_ij / a_jj (unit-lower convention divides
    # by the *column's* diagonal), U = upper triangle of A.
    L = sp.tril(A, k=-1, format="csr")
    L = sp.csr_matrix(L @ sp.diags(1.0 / dia_safe))
    U = sp.triu(A, k=0, format="csr")

    low_mask = sp.csr_matrix(
        (np.ones(L.nnz), L.indices.copy(), L.indptr.copy()), shape=A.shape
    )
    up_mask = sp.csr_matrix(
        (np.ones(U.nnz), U.indices.copy(), U.indptr.copy()), shape=A.shape
    )
    A_low = A.multiply(low_mask).tocsr()
    A_up = A.multiply(up_mask).tocsr()

    for _ in range(sweeps):
        Lu = sp.csr_matrix(L @ U)
        # L is strictly lower: (L U)∘up-pattern = Σ_{k<i} l_ik u_kj, so
        # the U equation solves by assignment; the low-pattern product
        # includes l_ij·u_jj, so the L equation is the increment form.
        R_low = (A_low - Lu.multiply(low_mask)).tocsr()
        U_new = (A_up - Lu.multiply(up_mask)).tocsr()
        d = U.diagonal()
        d = np.where(d != 0, d, 1.0)
        L = (L + sp.csr_matrix(R_low @ sp.diags(1.0 / d))).tocsr()
        U = U_new

    d = U.diagonal()
    d_safe = np.where(d != 0, d, 1.0)
    U_strict = sp.triu(U, k=1, format="csr")
    return L, U_strict, 1.0 / d_safe
