"""Chebyshev polynomial smoother.

Reference: amgcl/relaxation/chebyshev.hpp:55-204.  Eigenvalue interval
[rho*lower, rho*higher] with rho from the Gershgorin bound (or power
iteration); the sweep runs the same three-term recurrence as the reference
(chebyshev.hpp ``solve``), optionally on the diagonally-scaled system.
Degree is a static parameter so the sweep unrolls under jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ..ops.formats import SparseMatrix
from ..ops.spmv import spmv
from ..coarsening.smoothed_aggregation import spectral_radius


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["c", "d", "inv_dia"],
    meta_fields=["degree", "scale"],
)
@dataclasses.dataclass(frozen=True)
class ChebyshevState:
    c: jax.Array
    d: jax.Array
    inv_dia: jax.Array  # only used when scale=True (else a size-1 dummy)
    degree: int
    scale: bool


@dataclasses.dataclass
class Chebyshev:
    degree: int = 5
    higher: float = 1.0
    lower: float = 1.0 / 30.0
    power_iters: int = 0
    scale: bool = False

    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> ChebyshevState:
        dt = A_dev.dtype
        if self.scale:
            rho = spectral_radius(A_host, self.power_iters)  # of D^{-1}A
            dia = A_host.diagonal()
            inv = np.where(dia != 0, 1.0 / np.where(dia == 0, 1.0, dia), 1.0)
        else:
            rho = _plain_spectral_radius(A_host, self.power_iters)
            inv = np.ones(1)
        lo = rho * self.lower
        hi = rho * self.higher
        return ChebyshevState(
            c=jnp.asarray(0.5 * (hi - lo), dtype=dt),
            d=jnp.asarray(0.5 * (hi + lo), dtype=dt),
            inv_dia=jnp.asarray(inv, dtype=dt),
            degree=self.degree,
            scale=self.scale,
        )


def _plain_spectral_radius(A: sp.csr_matrix, power_iters: int) -> float:
    """rho(A) (unscaled): Gershgorin row sums or power iteration."""
    n = A.shape[0]
    if power_iters <= 0:
        rows = np.repeat(np.arange(n), np.diff(A.indptr))
        return float(
            np.max(np.bincount(rows, weights=np.abs(A.data), minlength=n))
        )
    rng = np.random.default_rng(0)
    b = rng.random(n)
    b /= np.linalg.norm(b)
    rho = 1.0
    for _ in range(power_iters):
        w = A @ b
        rho = float(b @ w)
        nw = np.linalg.norm(w)
        if nw == 0:
            break
        b = w / nw
    return abs(rho)


def chebyshev_apply(state: ChebyshevState, A: SparseMatrix, rhs, x=None):
    c, d = state.c, state.d
    zero_guess = x is None
    if zero_guess:
        x = jnp.zeros_like(rhs)
    p = jnp.zeros_like(x)
    alpha = jnp.zeros_like(c)
    for k in range(state.degree):
        # zero initial guess: the k=0 residual is rhs itself
        r = rhs if (k == 0 and zero_guess) else rhs - spmv(A, x)
        if state.scale:
            r = state.inv_dia * r
        if k == 0:
            alpha = 1.0 / d
            beta = jnp.zeros_like(c)
        elif k == 1:
            alpha = 2.0 * d / (2.0 * d * d - c * c)
            beta = alpha * d - 1.0
        else:
            alpha = 1.0 / (d - 0.25 * alpha * c * c)
            beta = alpha * d - 1.0
        p = alpha * r + beta * p
        x = x + p
    return x
