"""Mixed-precision iterative refinement driver.

The reference couples a float preconditioner with a double Krylov solver
(examples/mixed_precision.cpp).  On TPU, float64 is software-emulated
(~5x the cost of f32 on the vector units), so the TPU-native coupling
goes one step further: run the *whole Krylov solve in f32* and recover
f64 accuracy with an outer defect-correction loop —

    r_k = b - A x_k            (f64 operator, the only f64 work)
    solve A e = r_k in f32     (any inner solver + preconditioner)
    x_{k+1} = x_k + e

Classic iterative refinement: each outer pass multiplies the true
residual by the f32 solve's reduction factor, so a handful of f64 SpMVs
replaces f64 arithmetic in every Krylov operation.  Converges to
tol·||b|| measured on the *true* f64 residual (an f32-only Krylov solve
stalls near 1e-7 relative; see tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import SolveInfo, as_operator, norm_of
from ..ops import blas1


def refine(
    A,
    P=None,
    rhs=None,
    x0=None,
    *,
    tol=1e-8,
    abstol=1e-30,
    maxiter=50,
    inner="cg",
    inner_tol=1e-4,
    inner_maxiter=50,
    inner_product=blas1.inner_product,
    inner_dot=None,
    A32=None,
    verbose=False,
):
    """Outer defect-correction in the rhs dtype (use f64) around an f32
    inner solve.  ``maxiter`` bounds *outer* refinement passes; the
    returned iteration count is the total number of inner iterations.

    ``inner_dot`` is the inner solve's reduction; it defaults to a plain
    f32 dot — the outer loop absorbs its rounding, and skipping the
    f64-accumulation cast saves two vector casts per inner iteration.
    Pass a psum-wrapped dot for SPMD use (it is used for the outer norms
    as well via ``inner_product``)."""
    from . import make_solver_fn

    Aop = as_operator(A)
    if A32 is None:
        A32 = A.astype(jnp.float32) if hasattr(A, "astype") else A
    inner_fn = make_solver_fn(inner)
    norm = norm_of(inner_product)
    if inner_dot is None:
        inner_dot = (
            inner_product if inner_product is not blas1.inner_product
            else (lambda a, b: jnp.sum(a * b))
        )

    x = jnp.zeros_like(rhs) if x0 is None else x0
    norm_rhs = norm(rhs)
    safe = jnp.where(norm_rhs > 0, norm_rhs, jnp.ones_like(norm_rhs))
    eps = jnp.maximum(tol * safe, jnp.asarray(abstol, rhs.dtype))

    def true_resid(x):
        return rhs - Aop(x)

    r0 = true_resid(x)

    def cond(st):
        x, r, res, it, total = st
        return (it < maxiter) & (res > eps)

    def body(st):
        x, r, res, it, total = st
        e32, info = inner_fn(
            A32, P, r.astype(jnp.float32),
            jnp.zeros(r.shape, jnp.float32),
            tol=inner_tol, maxiter=inner_maxiter,
            inner_product=inner_dot, verbose=verbose,
        )
        x = x + e32.astype(x.dtype)
        r = true_resid(x)
        return x, r, norm(r), it + 1, total + info.iters

    st = (x, r0, norm(r0), jnp.asarray(0, jnp.int32),
          jnp.asarray(0, jnp.int32))
    x, r, res, it, total = jax.lax.while_loop(cond, body, st)
    return x, SolveInfo(total, res / safe)
