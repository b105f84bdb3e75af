"""Preconditioned conjugate gradients.

Capability parity with the reference CG (amgcl/solver/cg.hpp:67-252; the
iteration loop is :180-201).  The whole solve is one jitted
``lax.while_loop`` — control never returns to the host mid-solve, unlike
the reference whose loop runs on the host issuing backend kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (SolveInfo, as_operator, as_precond, norm_of,
                     progress_printer, stopping)
from ..ops import blas1


def cg(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    ns_search=False,
    inner_product=blas1.inner_product,
    verbose=False,
):
    """ns_search: when rhs is numerically zero, keep iterating from x0
    toward a nullspace vector of A instead of returning x = 0 at once
    (reference cg.hpp:162-169 `ns_search`)."""
    from .common import zero_rhs_guard

    Aop = as_operator(A)
    Pop = as_precond(P)
    norm = norm_of(inner_product)
    x = jnp.zeros_like(rhs) if x0 is None else x0

    x, norm_rhs = zero_rhs_guard(rhs, x, ns_search, inner_product)
    eps = jnp.maximum(tol * norm_rhs, jnp.asarray(abstol, rhs.dtype))
    r = rhs - Aop(x)
    res = norm(r)
    one = jnp.asarray(1.0, rhs.dtype)

    def cond(st):
        x, r, p, rho_prev, it, res = st
        return (it < maxiter) & (res > eps)

    def body(st):
        x, r, p, rho_prev, it, res = st
        s = Pop(r)
        rho = inner_product(r, s)
        beta = jnp.where(it == 0, jnp.zeros_like(rho), rho / rho_prev)
        p = s + beta * p
        q = Aop(p)
        alpha = rho / inner_product(q, p)
        x = x + alpha * p
        r = r - alpha * q
        res_new = norm(r)
        progress(it + 1, res_new)
        return x, r, p, rho, it + 1, res_new

    progress = progress_printer(verbose)
    p0 = jnp.zeros_like(rhs)
    x, r, p, rho, it, res = jax.lax.while_loop(
        cond, body, (x, r, p0, one, jnp.asarray(0, jnp.int32), res)
    )
    return x, SolveInfo(it, res / norm_rhs)
