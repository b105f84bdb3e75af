"""BiCGStab with selectable preconditioning side.

Capability parity with the reference (amgcl/solver/bicgstab.hpp:53 and
solver/precond_side.hpp:44): ``precond_side='right'`` (default) runs the
flexible right-preconditioned form; ``'left'`` applies the same loop to
the left-preconditioned system P(Ax) = P(rhs), converging in the
preconditioned residual norm exactly as the reference's left mode."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (SolveInfo, as_operator, as_precond, norm_of,
                     progress_printer, stopping)
from ..ops import blas1


def bicgstab(
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
    precond_side: str = "right",
    verbose=False,
):
    Aop = as_operator(A)
    Pop = as_precond(P)
    if precond_side == "left":
        A_inner, P_inner = (lambda v: Pop(Aop(v))), (lambda v: v)
        rhs = Pop(rhs)
    elif precond_side == "right":
        A_inner, P_inner = Aop, Pop
    else:
        raise ValueError(f"precond_side must be 'left'/'right', got "
                         f"{precond_side!r}")
    Aop, Pop = A_inner, P_inner
    norm = norm_of(inner_product)
    x = jnp.zeros_like(rhs) if x0 is None else x0

    from .common import zero_rhs_guard
    x, norm_rhs = zero_rhs_guard(rhs, x, ns_search, inner_product)
    eps = jnp.maximum(tol * norm_rhs, jnp.asarray(abstol, rhs.dtype))
    r = rhs - Aop(x)
    rhat = r
    res = norm(r)
    progress = progress_printer(verbose)
    one = jnp.asarray(1.0, rhs.dtype)
    zero = jnp.zeros_like(rhs)

    # state: x, r, p, v, rho_prev, alpha, omega, it, res
    def cond(st):
        return (st[-2] < maxiter) & (st[-1] > eps)

    def body(st):
        x, r, p, v, rho_prev, alpha, omega, it, res = st
        rho = inner_product(rhat, r)
        beta = jnp.where(
            it == 0, jnp.zeros_like(rho), (rho / rho_prev) * (alpha / omega)
        )
        p = r + beta * (p - omega * v)
        phat = Pop(p)
        v = Aop(phat)
        alpha = rho / inner_product(rhat, v)
        s = r - alpha * v
        shat = Pop(s)
        t = Aop(shat)
        omega = inner_product(t, s) / inner_product(t, t)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        res_new = norm(r)
        progress(it + 1, res_new)
        return x, r, p, v, rho, alpha, omega, it + 1, res_new

    st = (x, r, zero, zero, one, one, one, jnp.asarray(0, jnp.int32), res)
    x, r, *_, it, res = jax.lax.while_loop(cond, body, st)
    return x, SolveInfo(it, res / norm_rhs)
