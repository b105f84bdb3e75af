"""Use any smoother as a standalone single-level preconditioner.

Reference: amgcl/relaxation/as_preconditioner.hpp:42."""

from __future__ import annotations

import scipy.sparse as sp
import jax.numpy as jnp

from ..ops.formats import SparseMatrix
from .. import relaxation as rlx


class AsPreconditioner:
    def __init__(self, A, relaxation=None, block=1, dtype=jnp.float32):
        A = sp.csr_matrix(A)
        A.sort_indices()
        self.block = block
        self.A_dev = SparseMatrix.from_scipy(A, block=block, dtype=dtype)
        self.relaxation = relaxation or rlx.SPAI0()
        self.state = self.relaxation.setup(A, self.A_dev)

    def apply(self, r):
        dt = self.A_dev.dtype
        x = rlx.apply_standalone(self.state, self.A_dev, r.astype(dt))
        return x.astype(r.dtype)

    def system_matrix(self):
        return self.A_dev

    def __call__(self, r):
        return self.apply(r)


def make_relax_precond(state, A_dev):
    """Functional form for use under jit with state as an argument."""

    def apply(r):
        dt = A_dev.dtype
        x = rlx.apply_standalone(state, A_dev, r.astype(dt))
        return x.astype(r.dtype)

    return apply
