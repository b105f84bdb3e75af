"""ILUT(p, tau) — threshold incomplete LU.

Capability parity with the reference (amgcl/relaxation/ilut.hpp:55):
row-wise IKJ elimination keeping, per row, the p·(row fill) largest
entries above the relative drop tolerance tau.  Factorization runs on the
host (as all setup-phase factorizations do); the application reuses the
TPU-side Jacobi triangular solves of ilu0.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import jax.numpy as jnp

from ..ops.formats import from_scipy_auto
from .ilu0 import ILUState


@dataclasses.dataclass
class ILUT:
    p: float = 2.0      # fill factor per row relative to A's row fill
    tau: float = 1e-2   # relative drop tolerance
    damping: float = 1.0
    jacobi_iters: int = 2

    def setup(self, A_host: sp.csr_matrix, A_dev) -> ILUState:
        A = sp.csc_matrix(A_host)
        n = A.shape[0]
        avg_fill = A.nnz / n
        # scipy's spilu implements the same ILUT(p, tau) family (SuperLU):
        # fill_factor plays the role of p, drop_tol of tau.  natural
        # ordering keeps the factor pattern comparable to the reference.
        ilu = spla.spilu(
            A,
            drop_tol=self.tau,
            fill_factor=max(1.0, self.p),
            permc_spec="NATURAL",
            diag_pivot_thresh=0.0,
        )
        L = sp.csr_matrix(ilu.L)          # unit lower incl. diagonal
        U = sp.csr_matrix(ilu.U)
        if not (
            np.array_equal(ilu.perm_r, np.arange(n))
            and np.array_equal(ilu.perm_c, np.arange(n))
        ):
            # Pivoting kicked in despite NATURAL ordering — the Jacobi
            # triangular sweeps need unpermuted triangular factors, so fall
            # back to the level-of-fill factorization.
            from .iluk import ILUK

            return ILUK(
                k=1, damping=self.damping, jacobi_iters=self.jacobi_iters
            ).setup(A_host, A_dev)

        dia = U.diagonal()
        dia_safe = np.where(dia != 0, dia, 1.0)
        L_strict = sp.tril(L, k=-1, format="csr")
        U_strict = sp.triu(U, k=1, format="csr")
        dt = A_dev.dtype
        return ILUState(
            L=from_scipy_auto(L_strict, dtype=dt),
            U=from_scipy_auto(U_strict, dtype=dt),
            inv_dia=jnp.asarray(1.0 / dia_safe, dtype=dt),
            damping=jnp.asarray(self.damping, dtype=dt),
            jacobi_iters=self.jacobi_iters,
            block=getattr(A_dev, "block", 1),
        )
