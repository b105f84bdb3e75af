"""SPAI(0) — diagonal sparse approximate inverse smoother.

Reference: amgcl/relaxation/spai0.hpp:50-116 — m_i = a_ii / sum_j a_ij^2,
apply: x += M ∘ (rhs - A x)."""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ..ops.formats import SparseMatrix
from ..ops.spmv import spmv


@partial(
    jax.tree_util.register_dataclass, data_fields=["m"], meta_fields=[]
)
@dataclasses.dataclass(frozen=True)
class SPAI0State:
    m: jax.Array


@dataclasses.dataclass
class SPAI0:
    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> SPAI0State:
        n = A_host.shape[0]
        rows = np.repeat(np.arange(n), np.diff(A_host.indptr))
        row_sq = np.bincount(rows, weights=A_host.data**2, minlength=n)
        dia = A_host.diagonal()
        m = np.where(row_sq > 0, dia / np.where(row_sq == 0, 1.0, row_sq), 1.0)
        return SPAI0State(m=jnp.asarray(m, dtype=A_dev.dtype))


def spai0_apply(state: SPAI0State, A: SparseMatrix, rhs, x=None):
    if x is None:          # zero initial guess: skip the A @ 0 SpMV
        return state.m * rhs
    return x + state.m * (rhs - spmv(A, x))
