"""Shared Krylov infrastructure.

Mirrors the conventions of the reference iterative solver layer
(amgcl/solver/*.hpp): every solver takes (A, P, rhs, x0) plus params
{tol, abstol, maxiter}, and returns (x, iters, relative_residual) — the
reference's ``std::tuple<size_t, scalar> operator()``
(amgcl/solver/cg.hpp:152-218).  The inner product is injectable, which is
the single hook that turns a serial solver into a distributed one
(reference: amgcl/mpi/solver/cg.hpp:41-46).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.formats import (SparseMatrix, DiaMatrix, BlockDiaMatrix,
                           HybridEllMatrix)
from ..ops.pallas_sell import SellMatrix
from ..ops.pallas_sell2 import Sell2Matrix, Sell2F64Matrix
from ..ops.pallas_bsell import BlockSellMatrix
from ..ops.spmv import spmv
from ..ops import blas1


class SolveInfo(NamedTuple):
    iters: jax.Array
    error: jax.Array  # relative residual at exit


def as_operator(A) -> Callable:
    """Accept a sparse matrix (any device format) or a linear-operator
    callable."""
    if isinstance(A, (SparseMatrix, DiaMatrix, BlockDiaMatrix,
                      HybridEllMatrix, SellMatrix, Sell2Matrix,
                      Sell2F64Matrix, BlockSellMatrix)):
        return lambda v: spmv(A, v)
    if callable(A):
        return A
    raise TypeError(f"cannot interpret {type(A)} as a linear operator")


def as_precond(P) -> Callable:
    """Accept None (identity), a callable, or an object with .apply()."""
    if P is None:
        return lambda r: r
    if hasattr(P, "apply"):
        return P.apply
    if callable(P):
        return P
    raise TypeError(f"cannot interpret {type(P)} as a preconditioner")


def norm_of(inner):
    def _norm(x):
        return jnp.sqrt(jnp.abs(inner(x, x)))
    return _norm


def stopping(rhs, tol, abstol, inner):
    """eps and normalization: eps = max(tol*|rhs|, abstol)
    (reference: amgcl/solver/cg.hpp:161-171)."""
    norm_rhs = norm_of(inner)(rhs)
    safe = jnp.where(norm_rhs > 0, norm_rhs, jnp.ones_like(norm_rhs))
    eps = jnp.maximum(tol * safe, jnp.asarray(abstol, rhs.dtype))
    return safe, eps


def zero_rhs_guard(rhs, x0, ns_search, inner):
    """The reference's zero-rhs policy (amgcl/solver/cg.hpp:162-169,
    mirrored by every Krylov solver): when |rhs| is numerically zero,
    ns_search=False zeroes the initial guess so the loop exits
    immediately with x = 0 and 0 iterations; ns_search=True instead
    normalizes by 1 and keeps iterating from x0 toward a null-space
    vector of A.  Returns (x0', norm_rhs').

    Deviation from the reference: the zero test is exact (|rhs| == 0)
    rather than machine-epsilon — the mixed-precision defect-correction
    driver (solver/refine.py) legitimately passes inner right-hand sides
    of magnitude below f32 epsilon, which must still be solved."""
    nrm = norm_of(inner)(rhs)
    is_zero = nrm == 0
    safe = jnp.where(is_zero, jnp.ones_like(nrm), nrm)
    if not ns_search:
        x0 = jnp.where(is_zero, jnp.zeros_like(x0), x0)
    return x0, safe


def progress_printer(verbose: bool, every: int = 5):
    """Residual trace hook (reference: cg.hpp:199-200 prints every 5
    iterations under prm.verbose).  Returns a function usable inside
    jitted loop bodies — a no-op unless verbose."""
    if not verbose:
        return lambda it, res: None

    def _print(it, res):
        jax.lax.cond(
            it % every == 0,
            lambda: jax.debug.print("iter {it}: resid {res}", it=it, res=res),
            lambda: None,
        )

    return _print
