"""LGMRES — "loose" GMRES with restart augmentation.

Capability parity with the reference (amgcl/solver/lgmres.hpp:91, params
M/K): each GMRES(M) restart cycle augments the Krylov space with up to K
error-approximation vectors from previous restarts (Baker, Jessup &
Manteuffel).  Static shapes: the basis always has M columns, of which the
last (up to) K expand along stored augmentation vectors once available —
before that they expand the ordinary Krylov space (masked selection).
Right preconditioning on the composite operator; corrections map back
through P at exit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import SolveInfo, as_operator, as_precond, norm_of, stopping
from .gmres import _givens, _solve_upper
from ..ops import blas1


def lgmres(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    M=30,
    K=3,
    ns_search=False,
    inner_product=blas1.inner_product,
    verbose=False,
):
    Aop = as_operator(A)
    Pop = as_precond(P)
    norm = norm_of(inner_product)
    dtype = rhs.dtype
    n = rhs.shape[0]
    x_init = jnp.zeros_like(rhs) if x0 is None else x0
    Ahat = lambda v: Aop(Pop(v))

    from .common import zero_rhs_guard
    x_init, norm_rhs = zero_rhs_guard(rhs, x_init, ns_search, inner_product)
    eps = jnp.maximum(tol * norm_rhs, jnp.asarray(abstol, rhs.dtype))
    m = M

    def restart_cycle(y, Z, nz, it_total):
        """One augmented Arnoldi cycle. y: current solution of Ahat y = r0;
        Z: (K, n) stored augmentation vectors, nz: how many are valid."""
        r = (rhs - Aop(x_init)) - Ahat(y)
        beta = norm(r)

        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            jnp.where(beta > 0, r / beta, r)
        )
        Q = jnp.zeros((m, n), dtype)      # applied directions
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def cond(st):
            V, Q, H, cs, sn, g, j, res, it = st
            return (j < m) & (res > eps) & (it < maxiter)

        def body(st):
            V, Q, H, cs, sn, g, j, res, it = st
            # Direction: Krylov vector, or an augmentation vector for the
            # last nz slots.
            aug_slot = j - (m - nz)   # >= 0 → augmented expansion
            use_aug = aug_slot >= 0
            zidx = jnp.clip(aug_slot, 0, K - 1)
            q = jnp.where(use_aug, Z[zidx], V[j])
            Q = Q.at[j].set(q)
            w = Ahat(q)

            def mgs(i, carry):
                w, H = carry
                h = jnp.where(i <= j, inner_product(w, V[i]), jnp.zeros((), dtype))
                w = w - h * V[i]
                return w, H.at[i, j].set(h)

            w, H = jax.lax.fori_loop(0, m, mgs, (w, H))
            hjj = norm(w)
            H = H.at[j + 1, j].set(hjj)
            V = V.at[j + 1].set(jnp.where(hjj > 0, w / hjj, w))

            def rot(i, Hcol):
                hi = jnp.where(i < j, cs[i] * Hcol[i] + sn[i] * Hcol[i + 1], Hcol[i])
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
            return V, Q, H, cs, sn, g, j + 1, jnp.abs(g[j + 1]), it + 1

        st = (V, Q, H, cs, sn, g, jnp.asarray(0, jnp.int32), beta, it_total)
        V, Q, H, cs, sn, g, j, res, it_total = jax.lax.while_loop(
            cond, body, st
        )

        yy = _solve_upper(H[:m, :], g, j)
        dz = Q.T @ yy                      # new correction direction
        y = y + dz
        # Store normalized correction as a new augmentation vector.
        nrm = norm(dz)
        z_new = jnp.where(nrm > 0, dz / nrm, dz)
        Z = jnp.roll(Z, 1, axis=0).at[0].set(z_new)
        nz = jnp.minimum(nz + 1, K)
        return y, Z, nz, res, it_total

    def cond(st):
        y, Z, nz, res, it = st
        return (it < maxiter) & (res > eps)

    def body(st):
        y, Z, nz, res, it = st
        y, Z, nz, res, it = restart_cycle(y, Z, nz, it)
        return y, Z, nz, res, it

    r0n = norm(rhs - Aop(x_init))
    st = (
        jnp.zeros_like(rhs),
        jnp.zeros((K, n), dtype),
        jnp.asarray(0, jnp.int32),
        r0n,
        jnp.asarray(0, jnp.int32),
    )
    y, Z, nz, res, it = jax.lax.while_loop(cond, body, st)
    x = x_init + Pop(y)
    return x, SolveInfo(it, res / norm_rhs)
