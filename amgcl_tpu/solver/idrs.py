"""IDR(s) — Induced Dimension Reduction solver.

Capability parity with the reference (amgcl/solver/idrs.hpp:67), following
the IDR(s) variant with bi-orthogonalization of van Gijzen & Sonneveld
(ACM TOMS 2011).  The shadow space S (s × n) is a fixed random matrix
(deterministic seed, as the reference uses a seeded generator); s is
static so inner loops unroll under jit.  Right preconditioning through the
composite operator, mapped back at exit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .common import SolveInfo, as_operator, as_precond, norm_of, stopping
from ..ops import blas1


def idrs(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    s=4,
    omega_angle=0.7,
    replacement=False,
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
    r0 = rhs - Aop(x_init)
    res0 = norm(r0)

    # Shadow space: deterministic random (seeded, as the reference's seeded
    # generator), orthonormalized with a tall QR — computed in-trace so no
    # O(n·s) constant gets baked into the executable.
    S0 = jax.random.normal(jax.random.PRNGKey(42), (n, s), dtype=dtype)
    Sq, _ = jnp.linalg.qr(S0)
    S = Sq.T  # (s, n)

    angle = jnp.asarray(omega_angle, dtype)

    def sdot(v):
        # (s,) of inner products <S_i, v>
        return jnp.stack([inner_product(S[i], v) for i in range(s)])

    def cond(st):
        return (st[-2] < maxiter) & (st[-1] > eps)

    def body(st):
        y, r, G, U, M, om, it, res = st
        # G, U: (s, n); M: (s, s) with M = S G
        f = sdot(r)
        for k in range(s):
            # Solve the lower-triangular system M[k:, k:] c = f[k:] — we do a
            # full masked solve for static shapes.
            Mk = jnp.where(
                (jnp.arange(s)[:, None] >= k) & (jnp.arange(s)[None, :] >= k),
                M, jnp.eye(s, dtype=dtype),
            )
            fk = jnp.where(jnp.arange(s) >= k, f, jnp.zeros_like(f))
            c = jax.scipy.linalg.solve_triangular(Mk, fk, lower=True)
            v = r - jnp.einsum("i,in->n", c, G)
            uk = jnp.einsum("i,in->n", c, U) + om * v
            gk = Ahat(uk)
            # Bi-orthogonalize gk against S_0..S_{k-1} via G columns.
            for i in range(k):
                alpha = inner_product(S[i], gk) / M[i, i]
                gk = gk - alpha * G[i]
                uk = uk - alpha * U[i]
            G = G.at[k].set(gk)
            U = U.at[k].set(uk)
            Mk_new = sdot(gk)
            M = M.at[:, k].set(Mk_new)
            beta = f[k] / M[k, k]
            r = r - beta * gk
            y = y + beta * uk
            f = f - beta * Mk_new
            f = jnp.where(jnp.arange(s) <= k, jnp.zeros_like(f), f)

        # Dimension-reduction step: omega update
        v = r
        t = Ahat(v)
        ns_t = norm(t)
        ns_r = norm(r)
        ts = inner_product(t, r)
        rho = jnp.abs(ts / (ns_t * ns_r))
        om_new = ts / (ns_t * ns_t)
        om_new = jnp.where(
            rho < angle, om_new * angle / jnp.where(rho > 0, rho, 1.0), om_new
        )
        r = r - om_new * t
        y = y + om_new * v
        return y, r, G, U, M, om_new, it + 1, norm(r)

    st = (
        jnp.zeros_like(rhs),
        r0,
        jnp.zeros((s, n), dtype),
        jnp.zeros((s, n), dtype),
        jnp.eye(s, dtype=dtype),
        jnp.asarray(1.0, dtype),
        jnp.asarray(0, jnp.int32),
        res0,
    )
    y, r, G, U, M, om, it, res = jax.lax.while_loop(cond, body, st)
    x = x_init + Pop(y)
    return x, SolveInfo(it, res / norm_rhs)
