"""Damped Jacobi smoother.

Reference: amgcl/relaxation/damped_jacobi.hpp:54-133 (x += w * D^{-1}
(rhs - A x), default damping 0.72)."""

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
    jax.tree_util.register_dataclass,
    data_fields=["inv_dia", "damping"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class JacobiState:
    inv_dia: jax.Array
    damping: jax.Array


@dataclasses.dataclass
class DampedJacobi:
    damping: float = 0.72

    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> JacobiState:
        dia = A_host.diagonal()
        inv = np.where(dia != 0, 1.0 / np.where(dia == 0, 1.0, dia), 1.0)
        dt = A_dev.dtype
        return JacobiState(
            inv_dia=jnp.asarray(inv, dtype=dt),
            damping=jnp.asarray(self.damping, dtype=dt),
        )


def jacobi_apply(state: JacobiState, A: SparseMatrix, rhs, x=None):
    if x is None:          # zero initial guess: skip the A @ 0 SpMV
        return state.damping * state.inv_dia * rhs
    return x + state.damping * state.inv_dia * (rhs - spmv(A, x))
