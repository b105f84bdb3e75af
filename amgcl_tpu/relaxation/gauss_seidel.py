"""Gauss–Seidel smoother via multicolor ordering.

The reference runs serial or level-scheduled OpenMP sweeps
(amgcl/relaxation/gauss_seidel.hpp:58-229).  Sequential sweeps don't map to
TPU; the TPU-native equivalent is *multicolor* Gauss–Seidel: rows are
graph-colored at setup so that no two rows of one color couple, then each
color is updated in parallel — the same role level-scheduling plays for
the reference's OpenMP backend, with slightly different (but well-known)
convergence behaviour.  Forward sweep = colors in order (apply_pre),
backward sweep = reverse order (apply_post), matching the reference's
forward/backward sweep split.

Coloring uses an iterative random-priority MIS (Luby/Jones–Plassmann) in
vectorized numpy; block systems are colored on the pointwise graph so
whole blocks share a color.
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


def color_graph(A: sp.csr_matrix, seed: int = 7) -> np.ndarray:
    """Jones–Plassmann greedy coloring on the symmetrized pattern."""
    n = A.shape[0]
    G = A + A.T  # symmetrize pattern
    G = sp.csr_matrix(G)
    rng = np.random.default_rng(seed)
    prio = rng.permutation(n)
    colors = np.full(n, -1, dtype=np.int64)
    rows = np.repeat(np.arange(n), np.diff(G.indptr))
    cols = G.indices
    offdiag = rows != cols
    rows, cols = rows[offdiag], cols[offdiag]
    color = 0
    remaining = colors < 0
    while remaining.any():
        # A node joins this color if it has max priority among uncolored
        # neighbours.
        r_mask = remaining[rows] & remaining[cols]
        nb_max = np.full(n, -1, dtype=np.int64)
        np.maximum.at(nb_max, rows[r_mask], prio[cols[r_mask]])
        take = remaining & (prio > nb_max)
        colors[take] = color
        color += 1
        remaining = colors < 0
        if color > 4096:
            # JP always progresses (the max-priority uncolored node
            # joins every round); this guards pathological inputs only
            raise RuntimeError("coloring failed to converge")
    return colors


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["parts"],
    meta_fields=["block"],
)
@dataclasses.dataclass(frozen=True)
class GaussSeidelState:
    # parts: tuple of (rows_idx, A_rows, inv_dia) per color.
    parts: tuple
    block: int


@dataclasses.dataclass
class GaussSeidel:
    serial: bool = False  # kept for param parity; sweeps are always colored
    # Above this many colors a level degrades to damped Jacobi (hundreds of
    # tiny sequential device steps smooth worse than one Jacobi sweep).
    # Raise (or set to a large value) to force true multicolor GS anywhere.
    max_colors: int = 64

    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> GaussSeidelState:
        b = A_dev.block
        dt = A_dev.dtype
        n = A_host.shape[0]
        if b == 1:
            colors = color_graph(A_host)
        else:
            from ..coarsening.aggregates import pointwise_matrix
            colors = color_graph(pointwise_matrix(A_host, b))

        ncolors = int(colors.max()) + 1
        if ncolors > self.max_colors:
            # Near-dense levels (e.g. a nullspace-smoothed coarse RAP)
            # color into hundreds of parts — hundreds of tiny sequential
            # device steps smooth worse than one Jacobi sweep.  Degrade
            # gracefully for this level (the reference's sequential CPU
            # GS has no analogous constraint).
            import warnings

            from .damped_jacobi import DampedJacobi

            warnings.warn(
                f"gauss_seidel: {ncolors} colors on a dense level "
                f"(n={n}); using damped Jacobi for this level instead"
            )
            return DampedJacobi().setup(A_host, A_dev)

        parts = []
        for c in range(ncolors):
            brows = np.nonzero(colors == c)[0]
            if b == 1:
                srows = brows
            else:
                srows = (brows[:, None] * b + np.arange(b)[None, :]).ravel()
            Ac = SparseMatrix.from_scipy(
                sp.csr_matrix(A_host[srows]), block=b, dtype=dt
            )
            if b == 1:
                dia = A_host.diagonal()[srows]
                inv = np.where(dia != 0, 1.0 / np.where(dia == 0, 1.0, dia), 1.0)
            else:
                dia_blocks = np.stack(
                    [
                        np.asarray(
                            A_host[i * b : (i + 1) * b, i * b : (i + 1) * b].todense()
                        )
                        for i in brows
                    ]
                )
                inv = np.linalg.inv(dia_blocks)  # (nc, b, b)
            parts.append(
                (
                    jnp.asarray(srows, dtype=jnp.int32),
                    Ac,
                    jnp.asarray(inv, dtype=dt),
                )
            )
        return GaussSeidelState(parts=tuple(parts), block=b)


def _color_update(part, block, rhs, x):
    srows, Ac, inv = part
    r = rhs[srows] - spmv(Ac, x)
    if block == 1:
        dx = inv * r
    else:
        dx = jnp.einsum("nab,nb->na", inv, r.reshape(-1, block)).reshape(-1)
    return x.at[srows].add(dx)


def gs_apply(state: GaussSeidelState, A: SparseMatrix, rhs, x, *, reverse=False):
    parts = state.parts[::-1] if reverse else state.parts
    for part in parts:
        x = _color_update(part, state.block, rhs, x)
    return x
