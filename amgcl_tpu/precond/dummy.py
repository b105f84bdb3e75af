"""Identity preconditioner (reference: amgcl/preconditioner/dummy.hpp:41)."""

from __future__ import annotations

import scipy.sparse as sp
import jax.numpy as jnp

from ..ops.formats import SparseMatrix


class DummyPrecond:
    def __init__(self, A, block=1, dtype=jnp.float32):
        from ..ops.formats import DiaMatrix

        if isinstance(A, DiaMatrix):
            self.A_dev = A.astype(dtype)
        else:
            A = sp.csr_matrix(A)
            self.A_dev = SparseMatrix.from_scipy(A, block=block, dtype=dtype)

    def apply(self, r):
        return r

    def system_matrix(self):
        return self.A_dev

    def __call__(self, r):
        return r
