"""Preconditioned Richardson iteration and the single-application "preonly"
solver (for nesting preconditioners, e.g. inside CPR).

Capability parity: amgcl/solver/richardson.hpp:53 and
amgcl/solver/preonly.hpp:51.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (SolveInfo, as_operator, as_precond, norm_of,
                     progress_printer, stopping)
from ..ops import blas1


def richardson(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    damping=1.0,
    ns_search=False,
    inner_product=blas1.inner_product,
    verbose=False,
):
    Aop = as_operator(A)
    Pop = as_precond(P)
    norm = norm_of(inner_product)
    x = jnp.zeros_like(rhs) if x0 is None else x0
    from .common import zero_rhs_guard
    x, norm_rhs = zero_rhs_guard(rhs, x, ns_search, inner_product)
    eps = jnp.maximum(tol * norm_rhs, jnp.asarray(abstol, rhs.dtype))
    r = rhs - Aop(x)
    res = norm(r)
    progress = progress_printer(verbose)
    w = jnp.asarray(damping, rhs.dtype)

    def cond(st):
        x, r, it, res = st
        return (it < maxiter) & (res > eps)

    def body(st):
        x, r, it, res = st
        x = x + w * Pop(r)
        r = rhs - Aop(x)
        res_new = norm(r)
        progress(it + 1, res_new)
        return x, r, it + 1, res_new

    x, r, it, res = jax.lax.while_loop(
        cond, body, (x, r, jnp.asarray(0, jnp.int32), res)
    )
    return x, SolveInfo(it, res / norm_rhs)


def preonly(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=1,
    inner_product=blas1.inner_product,
    verbose=False,
):
    Aop = as_operator(A)
    Pop = as_precond(P)
    norm = norm_of(inner_product)
    norm_rhs, eps = stopping(rhs, tol, abstol, inner_product)
    x = Pop(rhs)
    res = norm(rhs - Aop(x))
    return x, SolveInfo(jnp.asarray(1, jnp.int32), res / norm_rhs)
