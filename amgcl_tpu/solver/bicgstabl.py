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
    delta=0.0,
    convex=True,
    ns_search=False,
    inner_product=blas1.inner_product,
    verbose=False,
):
    """delta > 0 enables the reference's reliable-update (residual
    replacement) strategy (bicgstabl.hpp:386-411): when the residual
    drops far enough below its running maxima, the true residual is
    recomputed and the accumulated correction folded into x.  convex
    selects the minimal-residual polynomial (True, default) or the
    'maintaining convergence' Y0/YL combination (bicgstabl.hpp:318-366).
    """
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

    # y accumulates the solution of Ahat y = b_cur; with delta > 0 the
    # reliable-update machinery periodically folds y into x_acc and
    # re-bases b_cur on the recomputed true residual
    # (reference: bicgstabl.hpp:386-411).
    def cond(st):
        return (st[6] < maxiter) & (st[7] > eps)

    def body(st):
        (y, R, U, rho0, alpha, omega, it, res,
         x_acc, b_cur, rnmax_c, rnmax_t) = st
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

        # --- polynomial part: normal equations of the R Krylov block
        # (reference builds the same MZa Gram matrix,
        # bicgstabl.hpp:303-366) ---
        Mm = jnp.stack([
            jnp.stack([inner_product(R[i], R[j]) for j in range(L + 1)])
            for i in range(L + 1)
        ])
        if convex or L == 1:
            ysol = jnp.linalg.solve(Mm[1:, 1:], Mm[1:, 0])      # (L,)
            Y0 = jnp.concatenate([-jnp.ones(1, dtype), ysol])
        else:
            Minner = Mm[1:L, 1:L]
            y0in = jnp.linalg.solve(Minner, Mm[1:L, 0])
            yLin = jnp.linalg.solve(Minner, Mm[1:L, L])
            Y0 = jnp.concatenate(
                [-jnp.ones(1, dtype), y0in, jnp.zeros(1, dtype)]
            )
            YL = jnp.concatenate(
                [jnp.zeros(1, dtype), yLin, -jnp.ones(1, dtype)]
            )
            dot0 = Y0 @ (Mm @ Y0)
            dot1 = YL @ (Mm @ YL)
            dotA = YL @ (Mm @ Y0)
            kappa0 = jnp.sqrt(jnp.abs(dot0))
            kappa1 = jnp.sqrt(jnp.abs(dot1))
            ghat = jnp.where(
                jnp.abs(dotA) < 0.7 * kappa0 * kappa1,
                jnp.sign(dotA) * 0.7 * kappa0
                / jnp.where(kappa1 == 0, one, kappa1),
                dotA / jnp.where(dot1 == 0, one, dot1),
            )
            ghat = jnp.where((kappa0 == 0) | (kappa1 == 0), 0.0, ghat)
            Y0 = Y0 - ghat * YL

        omega = Y0[L]
        y = y + jnp.einsum("i,in->n", Y0[1:], R[:L])
        Rn0 = R[0] - jnp.einsum("i,in->n", Y0[1:], R[1:])
        Un0 = U[0] - jnp.einsum("i,in->n", Y0[1:], U[1:])
        R = R.at[0].set(Rn0)
        U = U.at[0].set(Un0)
        zeta = norm(R[0])

        if delta > 0:
            # reliable update: recompute the true residual / fold the
            # correction when zeta sinks far below its running maxima
            zeta0 = res
            rnmax_c = jnp.maximum(zeta, rnmax_c)
            rnmax_t = jnp.maximum(zeta, rnmax_t)
            update_x = (zeta < delta * zeta0) & (zeta0 <= rnmax_c)
            recompute = (
                ((zeta < delta * rnmax_t) & (zeta <= rnmax_t)) | update_x
            )
            R0_true = jax.lax.cond(
                recompute,
                lambda: b_cur - Ahat(y),
                lambda: R[0],
            )
            R = R.at[0].set(R0_true)
            rnmax_t = jnp.where(recompute, zeta, rnmax_t)
            x_acc = jnp.where(update_x, x_acc + y, x_acc)
            b_cur = jnp.where(update_x, R0_true, b_cur)
            y = jnp.where(update_x, jnp.zeros_like(y), y)
            rnmax_c = jnp.where(update_x, zeta, rnmax_c)

        return (y, R, U, rho0, alpha, omega, it + 1, zeta,
                x_acc, b_cur, rnmax_c, rnmax_t)

    R0 = jnp.zeros((L + 1, n), dtype).at[0].set(r0)
    U0 = jnp.zeros((L + 1, n), dtype)
    st = (
        jnp.zeros_like(rhs), R0, U0, one, jnp.zeros((), dtype), one,
        jnp.asarray(0, jnp.int32), res0,
        jnp.zeros_like(rhs), r0, res0, res0,
    )
    out = jax.lax.while_loop(cond, body, st)
    y, it, res, x_acc = out[0], out[6], out[7], out[8]
    x = x_init + Pop(x_acc + y)
    return x, SolveInfo(it, res / norm_rhs)
