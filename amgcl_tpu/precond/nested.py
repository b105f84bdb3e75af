"""Nested preconditioner — a complete inner solver (its own Krylov method
plus its own preconditioner, built from config alone) applied as the
preconditioner of an outer solver.

Capability parity with the reference's runtime `nested` preconditioner
class (amgcl/preconditioner/runtime.hpp:54-98), where a make_solver is
composed inside another make_solver purely from the parameter tree.
With a nonstationary inner solver the outer method should be flexible
(fgmres), exactly as with the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


class NestedSolverPrecond:
    def __init__(self, inner):
        self.inner = inner          # an api.Solver

    def apply(self, r):
        dt = self.inner.A_dev.dtype
        x, _ = self.inner._compiled(
            r.astype(dt), jnp.zeros(r.shape, dt)
        )
        return x.astype(r.dtype)

    def system_matrix(self):
        return self.inner.A_dev

    def __call__(self, r):
        return self.apply(r)
