"""Restarted GMRES(m) and flexible FGMRES(m).

Capability parity with the reference (amgcl/solver/gmres.hpp:56 and
amgcl/solver/fgmres.hpp:54; Givens rotations as in
amgcl/solver/detail/givens_rotations.hpp).  Right preconditioning: for
GMRES the preconditioner is linear so the restart correction is a single
P(V^T y); FGMRES stores the preconditioned basis Z explicitly, allowing a
nonlinear / iteration-varying preconditioner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import (SolveInfo, as_operator, as_precond, norm_of,
                     progress_printer, stopping)
from ..ops import blas1


def _givens(a, b):
    """Stable Givens rotation: returns (c, s, r) with [c s; -s c]ᵀ[a;b]=[r;0]."""
    denom = jnp.sqrt(a * a + b * b)
    safe = jnp.where(denom > 0, denom, jnp.ones_like(denom))
    c = jnp.where(denom > 0, a / safe, jnp.ones_like(a))
    s = jnp.where(denom > 0, b / safe, jnp.zeros_like(b))
    return c, s, denom


def _solve_upper(H, g, j):
    """Back-substitute the j×j leading block of upper-triangular H; entries
    beyond j are masked to identity so the result is y with y[j:] = 0."""
    m = H.shape[1]
    idx = jnp.arange(m)
    active = idx < j
    Hm = jnp.where(
        active[:, None] & active[None, :], H[:m, :], jnp.eye(m, dtype=H.dtype)
    )
    gm = jnp.where(active, g[:m], jnp.zeros_like(g[:m]))
    y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
    return y


def _gmres_impl(
    Aop, Pop, rhs, x, *, tol, abstol, maxiter, m, inner_product, flexible,
    ns_search=False, verbose=False,
):
    norm = norm_of(inner_product)
    progress = progress_printer(verbose)
    n = rhs.shape[0]
    dtype = rhs.dtype
    from .common import zero_rhs_guard
    x, norm_rhs = zero_rhs_guard(rhs, x, ns_search, inner_product)
    eps = jnp.maximum(tol * norm_rhs, jnp.asarray(abstol, rhs.dtype))

    def arnoldi_cycle(x, it_total):
        r = rhs - Aop(x)
        beta = norm(r)

        V = jnp.zeros((m + 1, n), dtype)
        # The preconditioned basis is stored even for plain GMRES: with an
        # inexactly-applied (e.g. float32 V-cycle) preconditioner the
        # single-P(V y) recombination drifts from the Givens residual
        # estimate; storing Z keeps the update exact for both variants.
        Z = jnp.zeros((m, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        V = V.at[0].set(jnp.where(beta > 0, r / beta, r))

        def cond(st):
            V, Z, H, cs, sn, g, j, res, it = st
            return (j < m) & (res > eps) & (it < maxiter)

        def body(st):
            V, Z, H, cs, sn, g, j, res, it = st
            vj = V[j]
            z = Pop(vj)
            Z = Z.at[j].set(z)
            w = Aop(z)
            # Modified Gram-Schmidt over the full (masked) basis.
            def mgs(i, carry):
                w, H = carry
                h = jnp.where(i <= j, inner_product(w, V[i]), jnp.zeros((), dtype))
                w = w - h * V[i]
                return w, H.at[i, j].set(h)

            w, H = jax.lax.fori_loop(0, m, mgs, (w, H))
            hjj = norm(w)
            H = H.at[j + 1, j].set(hjj)
            V = V.at[j + 1].set(jnp.where(hjj > 0, w / hjj, w))

            # Apply previous Givens rotations to the new column.
            def rot(i, Hcol):
                hi = jnp.where(
                    i < j, cs[i] * Hcol[i] + sn[i] * Hcol[i + 1], Hcol[i]
                )
                hip = jnp.where(
                    i < j, -sn[i] * Hcol[i] + cs[i] * Hcol[i + 1], Hcol[i + 1]
                )
                return Hcol.at[i].set(hi).at[i + 1].set(hip)

            Hcol = jax.lax.fori_loop(0, m, rot, H[:, j])
            c, s, rr = _givens(Hcol[j], Hcol[j + 1])
            Hcol = Hcol.at[j].set(rr).at[j + 1].set(jnp.zeros((), dtype))
            H = H.at[:, j].set(Hcol)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            g = g.at[j + 1].set(-s * g[j])
            g = g.at[j].set(c * g[j])
            res = jnp.abs(g[j + 1])
            return V, Z, H, cs, sn, g, j + 1, res, it + 1

        st = (V, Z, H, cs, sn, g, jnp.asarray(0, jnp.int32), beta, it_total)
        V, Z, H, cs, sn, g, j, res, it_total = jax.lax.while_loop(cond, body, st)

        # both variants use the stored preconditioned basis
        y = _solve_upper(H[:m, :], g, j)
        dx = Z.T @ y
        progress(it_total, res)
        return x + dx, res, it_total

    def cond(st):
        x, res, it = st
        return (it < maxiter) & (res > eps)

    def body(st):
        x, res, it = st
        return arnoldi_cycle(x, it)

    r0 = norm(rhs - Aop(x))
    x, res, it = jax.lax.while_loop(
        cond, body, (x, r0, jnp.asarray(0, jnp.int32))
    )
    return x, SolveInfo(it, res / norm_rhs)


def gmres(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    M=30,
    ns_search=False,
    inner_product=blas1.inner_product,
    verbose=False,
):
    x = jnp.zeros_like(rhs) if x0 is None else x0
    return _gmres_impl(
        as_operator(A), as_precond(P), rhs, x,
        tol=tol, abstol=abstol, maxiter=maxiter, m=M,
        inner_product=inner_product, flexible=False, ns_search=ns_search,
        verbose=verbose,
    )


def fgmres(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    M=30,
    ns_search=False,
    inner_product=blas1.inner_product,
    verbose=False,
):
    x = jnp.zeros_like(rhs) if x0 is None else x0
    return _gmres_impl(
        as_operator(A), as_precond(P), rhs, x,
        tol=tol, abstol=abstol, maxiter=maxiter, m=M,
        inner_product=inner_product, flexible=True, ns_search=ns_search,
        verbose=verbose,
    )
