"""ILUT(p, tau) — threshold incomplete LU.

Reference-exact semantics (amgcl/relaxation/ilut.hpp:55-198,330-378):
row-wise IKJ elimination with a sparse accumulator; per row keep the
int(lenL·p) largest L entries above the relative drop tolerance
tol = tau·Σ|a_ij|/(lenL+lenU), the diagonal (inverted), and the
int(lenU·p)−1 largest strict-upper entries above tol.  Factorization runs
on the host in the C++ native module (the reference's is serial CPU code
too); a pure-Python mirror of the same algorithm covers toolchain-less
installs.  A zero pivot raises — there is no silent fallback to a
different smoother.  Application reuses the TPU-side Jacobi triangular
sweeps of ilu0.
"""

from __future__ import annotations

import dataclasses
import heapq

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from ..ops.formats import from_scipy_auto
from .ilu0 import ILUState


def _ilut_py(indptr, indices, data, n, p, tau):
    """Pure-Python mirror of native ilut_factor (same drop/keep rules)."""
    Lptr = [0]
    Uptr = [0]
    Lcol, Lval, Ucol, Uval = [], [], [], []
    Dinv = np.zeros(n)
    w = {}
    for i in range(n):
        w.clear()
        heap = []
        lenL = lenU = 0
        row_norm = 0.0
        for j in range(indptr[i], indptr[i + 1]):
            c = int(indices[j])
            w[c] = float(data[j])
            row_norm += abs(data[j])
            if c < i:
                lenL += 1
                heapq.heappush(heap, c)
            elif c > i:
                lenU += 1
        tol = tau * row_norm / (lenL + lenU) if (lenL + lenU) else 0.0

        while heap:
            k = heapq.heappop(heap)
            lik = w[k] * Dinv[k]
            w[k] = lik
            if abs(lik) > tol:
                for t in range(Uptr[k], Uptr[k + 1]):
                    c = Ucol[t]
                    if c not in w:
                        w[c] = 0.0
                        if c < i:
                            heapq.heappush(heap, c)
                    w[c] -= lik * Uval[t]

        Lkeep = sorted(
            sorted((c for c in w if c < i and abs(w[c]) > tol),
                   key=lambda c: -abs(w[c]))[: int(lenL * p)]
        )
        Lcol.extend(Lkeep)
        Lval.extend(w[c] for c in Lkeep)
        Lptr.append(len(Lcol))

        dv = w.get(i, 0.0)
        if dv == 0.0:
            raise RuntimeError(
                f"ilut: zero pivot in row {i} "
                "(structural breakdown; no silent fallback)"
            )
        Dinv[i] = 1.0 / dv

        up = max(0, int(lenU * p) - 1)
        Ukeep = sorted(
            sorted((c for c in w if c > i and abs(w[c]) > tol),
                   key=lambda c: -abs(w[c]))[:up]
        )
        Ucol.extend(Ukeep)
        Uval.extend(w[c] for c in Ukeep)
        Uptr.append(len(Ucol))
    return (
        np.asarray(Lptr), np.asarray(Lcol, np.int64), np.asarray(Lval),
        np.asarray(Uptr), np.asarray(Ucol, np.int64), np.asarray(Uval),
        Dinv,
    )


@dataclasses.dataclass
class ILUT:
    p: float = 2.0      # fill factor per row relative to A's row fill
    tau: float = 1e-2   # drop tolerance relative to the mean row magnitude
    damping: float = 1.0
    jacobi_iters: int = 2

    def setup(self, A_host: sp.csr_matrix, A_dev) -> ILUState:
        A = sp.csr_matrix(A_host)
        A.sort_indices()
        n = A.shape[0]
        from .. import native

        if native.lib is not None:
            Lp, Lc, Lv, Up, Uc, Uv, Dinv = native.lib.ilut(
                A.indptr, A.indices, A.data, self.p, self.tau
            )
        else:
            Lp, Lc, Lv, Up, Uc, Uv, Dinv = _ilut_py(
                A.indptr.astype(np.int64), A.indices.astype(np.int64),
                A.data.astype(np.float64), n, self.p, self.tau,
            )

        L_strict = sp.csr_matrix(
            (Lv[: Lp[-1]], Lc[: Lp[-1]], Lp), shape=(n, n)
        )
        U_strict = sp.csr_matrix(
            (Uv[: Up[-1]], Uc[: Up[-1]], Up), shape=(n, n)
        )
        dt = A_dev.dtype
        return ILUState(
            L=from_scipy_auto(L_strict, dtype=dt),
            U=from_scipy_auto(U_strict, dtype=dt),
            inv_dia=jnp.asarray(Dinv, dtype=dt),
            damping=jnp.asarray(self.damping, dtype=dt),
            jacobi_iters=self.jacobi_iters,
            block=getattr(A_dev, "block", 1),
        )
