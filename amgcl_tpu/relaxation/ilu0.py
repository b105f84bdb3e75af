"""ILU(0) smoother with TPU-parallel triangular solves.

Factorization: zero-fill-in IKJ ILU on the host at setup (the reference
also factorizes serially on the CPU, amgcl/relaxation/ilu0.hpp:123-200),
with a C++ native kernel when built (amgcl_tpu/native).

Application: sparse triangular solves are sequential, so — like the
reference's GPU-friendly variant ilu0_chow_patel
(amgcl/relaxation/ilu0_chow_patel.hpp:86, its ``solve`` uses Jacobi-style
iterations on the triangular factors) — the solves here are fixed-count
Jacobi iterations on the factors, which are just ELL SpMVs:

    L y = r  (unit lower):  y_{m+1} = r - L_strict y_m
    U z = y:                z_{m+1} = D^{-1} (y - U_strict z_m)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ..ops.formats import SparseMatrix
from ..ops.spmv import spmv


def ilu0_factor_host(A: sp.csr_matrix):
    """IKJ ILU(0) on the CSR pattern. Returns (L_strict, U) scipy CSR with
    U including the diagonal."""
    try:
        from ..native import lib as _native
    except Exception:
        _native = None
    A = sp.csr_matrix(A)
    A.sort_indices()
    if _native is not None:
        lu = _native.ilu0(A.indptr, A.indices, A.data.astype(np.float64))
    else:
        lu = _ilu0_py(A.indptr, A.indices, A.data.astype(np.float64).copy())
    n = A.shape[0]
    M = sp.csr_matrix((lu, A.indices, A.indptr), shape=A.shape)
    L = sp.tril(M, k=-1, format="csr")
    U = sp.triu(M, k=0, format="csr")
    return L, U


def _ilu0_py(indptr, indices, data):
    """Pure-python IKJ fallback (native kernel preferred for large n)."""
    n = len(indptr) - 1
    dia_idx = np.zeros(n, dtype=np.int64)
    for i in range(n):
        row = slice(indptr[i], indptr[i + 1])
        cols_i = indices[row]
        # position map for row i
        pos = {c: indptr[i] + t for t, c in enumerate(cols_i)}
        dfound = False
        for j_idx in range(indptr[i], indptr[i + 1]):
            k = indices[j_idx]
            if k >= i:
                if k == i:
                    dia_idx[i] = j_idx
                    dfound = True
                break
            # data[j_idx] = a_ik / u_kk
            data[j_idx] /= data[dia_idx[k]]
            lik = data[j_idx]
            for t in range(dia_idx[k] + 1, indptr[k + 1]):
                c = indices[t]
                p = pos.get(c)
                if p is not None:
                    data[p] -= lik * data[t]
        if not dfound:
            raise RuntimeError(f"ilu0: missing diagonal in row {i}")
    return data


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["L", "U", "inv_dia", "damping"],
    meta_fields=["jacobi_iters", "block"],
)
@dataclasses.dataclass(frozen=True)
class ILUState:
    L: SparseMatrix          # strict lower (unit diagonal implied)
    U: SparseMatrix          # strict upper
    inv_dia: jax.Array       # 1/diag(U)
    damping: jax.Array
    jacobi_iters: int
    block: int


@dataclasses.dataclass
class ILU0:
    damping: float = 1.0
    jacobi_iters: int = 2

    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> ILUState:
        dt = A_dev.dtype
        L, U = ilu0_factor_host(A_host)
        dia = U.diagonal()
        U_strict = sp.triu(U, k=1, format="csr")
        inv = np.where(dia != 0, 1.0 / np.where(dia == 0, 1.0, dia), 1.0)
        from ..ops.formats import from_scipy_auto
        return ILUState(
            L=from_scipy_auto(L, dtype=dt),
            U=from_scipy_auto(U_strict, dtype=dt),
            inv_dia=jnp.asarray(inv, dtype=dt),
            damping=jnp.asarray(self.damping, dtype=dt),
            jacobi_iters=self.jacobi_iters,
            block=A_dev.block,
        )


def ilu_tri_solve(state: ILUState, r):
    """Approximate (LU)^{-1} r with fixed-count Jacobi sweeps."""
    y = r
    for _ in range(state.jacobi_iters):
        y = r - spmv(state.L, y)
    z = state.inv_dia * y
    for _ in range(state.jacobi_iters):
        z = state.inv_dia * (y - spmv(state.U, z))
    return z


def ilu_apply(state: ILUState, A: SparseMatrix, rhs, x=None):
    if x is None:          # zero initial guess: skip the A @ 0 SpMV
        return state.damping * ilu_tri_solve(state, rhs)
    r = rhs - spmv(A, x)
    return x + state.damping * ilu_tri_solve(state, r)
