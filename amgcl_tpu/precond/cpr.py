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

        W = self.compute_weights(sp.csr_matrix(K[:N, :N]), B)  # (np, B)

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

    @staticmethod
    def _block_diag(Kb: sp.bsr_matrix, np_: int):
        """Vectorized (np, B, B) diagonal-block extraction."""
        B = Kb.blocksize[0]
        rows_b = np.repeat(np.arange(np_), np.diff(Kb.indptr))
        hits = rows_b == Kb.indices
        D = np.zeros((np_, B, B))
        D[rows_b[hits]] = Kb.data[hits]
        return D

    def compute_weights(self, K: sp.csr_matrix, B: int) -> np.ndarray:
        """Quasi-IMPES weights: first row of each inverted transposed
        diagonal block (cpr.hpp:245-259)."""
        np_ = K.shape[0] // B
        Kb = sp.bsr_matrix(K, blocksize=(B, B))
        Kb.sum_duplicates()
        D = self._block_diag(Kb, np_)
        sing = np.abs(np.linalg.det(D)) < 1e-300
        D[sing] = np.eye(B)
        return np.linalg.inv(np.transpose(D, (0, 2, 1)))[:, 0, :]

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
    """CPR with dynamic row sums (amgcl/preconditioner/cpr_drs.hpp:45).

    Instead of quasi-IMPES inversion, each scalar equation i of a block
    row contributes weight delta_i ∈ {user weight, 0} to the pressure
    reduction; delta_i is zeroed (for i > 0) when the equation's
    own-pressure coupling is not diagonally dominant
    (a_dia[i] < eps_dd · Σ|off-block pressure couplings|) or when the
    pressure equation barely couples to variable i
    (a_top[i] < eps_ps · |a_dia[0]|) — reference cpr_drs.hpp:305-322.
    """

    def __init__(self, K, block_size, *, weights=None, eps_dd=0.2,
                 eps_ps=0.02, **kw):
        self._drs = dict(weights=weights, eps_dd=eps_dd, eps_ps=eps_ps)
        super().__init__(K, block_size, **kw)

    def compute_weights(self, K: sp.csr_matrix, B: int) -> np.ndarray:
        np_ = K.shape[0] // B
        Kb = sp.bsr_matrix(K, blocksize=(B, B))
        Kb.sum_duplicates()
        rows_b = np.repeat(np.arange(np_), np.diff(Kb.indptr))
        dia_hit = rows_b == Kb.indices

        # a_dia[ip, i] = K[ip*B+i, ip*B+0] (own-pressure coupling)
        D = self._block_diag(Kb, np_)
        a_dia = D[:, :, 0]                                 # (np, B)
        # a_off[ip, i] = Σ_{jp != ip} |K[ip*B+i, jp*B+0]|
        off_vals = np.abs(Kb.data[~dia_hit][:, :, 0])      # (nnz_off, B)
        a_off = np.zeros((np_, B))
        np.add.at(a_off, rows_b[~dia_hit], off_vals)
        # a_top[ip, c] = Σ_jp |K[ip*B+0, jp*B+c]| (pressure-equation row)
        a_top = np.zeros((np_, B))
        np.add.at(a_top, rows_b, np.abs(Kb.data[:, 0, :]))

        W = (
            np.asarray(self._drs["weights"], dtype=np.float64).reshape(np_, B)
            if self._drs["weights"] is not None
            else np.ones((np_, B))
        )
        eps_dd, eps_ps = self._drs["eps_dd"], self._drs["eps_ps"]
        # a_dia is deliberately SIGNED (reference cpr_drs.hpp:283,314):
        # an equation whose own-pressure coupling is negative is excluded
        # from the reduction regardless of magnitude.
        kill = (a_dia < eps_dd * a_off) | (
            a_top < eps_ps * np.abs(a_dia[:, :1])
        )
        kill[:, 0] = False                                 # delta_0 survives
        return np.where(kill, 0.0, W)
