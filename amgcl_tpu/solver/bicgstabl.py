"""BiCGStab(L) — Sleijpen & Fokkema's stabilized bi-CG with an L-step
minimal-residual polynomial part.

Capability parity with the reference (amgcl/solver/bicgstabl.hpp:86, params
L and delta-style convex combination omitted in favour of the plain MR
update).  Right preconditioning on the composite operator A∘P; the
correction is mapped back through P at exit (P is linear).  L is static so
the inner BiCG/MR loops unroll under jit; the Krylov blocks R, U live as
(L+1, n) stacked arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import SolveInfo, as_operator, as_precond, norm_of, stopping
from ..ops import blas1


def bicgstabl(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=100,
    L=2,
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
    rtilde = r0
    res0 = norm(r0)

    one = jnp.asarray(1.0, dtype)

    # y accumulates the solution of Ahat y = r0; x = x_init + P(y).
    def cond(st):
        return (st[-2] < maxiter) & (st[-1] > eps)

    def body(st):
        y, R, U, rho0, alpha, omega, it, res = st
        rho0 = -omega * rho0

        # --- BiCG part ---
        for j in range(L):
            rho1 = inner_product(rtilde, R[j])
            beta = alpha * rho1 / rho0
            rho0 = rho1
            for i in range(j + 1):
                U = U.at[i].set(R[i] - beta * U[i])
            U = U.at[j + 1].set(Ahat(U[j]))
            gamma = inner_product(rtilde, U[j + 1])
            alpha = rho0 / gamma
            for i in range(j + 1):
                R = R.at[i].set(R[i] - alpha * U[i + 1])
            R = R.at[j + 1].set(Ahat(R[j]))
            y = y + alpha * U[0]

        # --- MR part (modified Gram-Schmidt on R[1..L]) ---
        tau = [[jnp.zeros((), dtype) for _ in range(L + 1)] for _ in range(L + 1)]
        sigma = [jnp.zeros((), dtype) for _ in range(L + 1)]
        gammap = [jnp.zeros((), dtype) for _ in range(L + 1)]
        for j in range(1, L + 1):
            for i in range(1, j):
                tij = inner_product(R[j], R[i]) / sigma[i]
                tau[i][j] = tij
                R = R.at[j].set(R[j] - tij * R[i])
            sigma[j] = inner_product(R[j], R[j])
            gammap[j] = inner_product(R[0], R[j]) / sigma[j]

        gamma = [jnp.zeros((), dtype) for _ in range(L + 1)]
        gamma[L] = gammap[L]
        omega = gamma[L]
        for j in range(L - 1, 0, -1):
            g = gammap[j]
            for i in range(j + 1, L + 1):
                g = g - tau[j][i] * gamma[i]
            gamma[j] = g
        gammapp = [jnp.zeros((), dtype) for _ in range(L)]
        for j in range(1, L):
            g = gamma[j + 1]
            for i in range(j + 1, L):
                g = g + tau[j][i] * gamma[i + 1]
            gammapp[j] = g

        y = y + gamma[1] * R[0]
        Rn0 = R[0] - gammap[L] * R[L]
        Un0 = U[0] - gamma[L] * U[L]
        for j in range(1, L):
            Un0 = Un0 - gamma[j] * U[j]
            y = y + gammapp[j] * R[j]
            Rn0 = Rn0 - gammap[j] * R[j]
        R = R.at[0].set(Rn0)
        U = U.at[0].set(Un0)

        return y, R, U, rho0, alpha, omega, it + 1, norm(R[0])

    R0 = jnp.zeros((L + 1, n), dtype).at[0].set(r0)
    U0 = jnp.zeros((L + 1, n), dtype)
    st = (
        jnp.zeros_like(rhs), R0, U0, one, jnp.zeros((), dtype), one,
        jnp.asarray(0, jnp.int32), res0,
    )
    y, R, U, rho0, alpha, omega, it, res = jax.lax.while_loop(cond, body, st)
    x = x_init + Pop(y)
    return x, SolveInfo(it, res / norm_rhs)
