"""Synthetic model problems.

The testing backbone of the reference is a single in-process generated 3D
Poisson problem (reference: tests/sample_problem.hpp:10-84 — 7-point stencil
on an n³ grid, usable with scalar / complex / block value types).  These
generators play the same role for this framework's tests, benchmarks and
tutorials.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def poisson3d(n: int, dtype=np.float64) -> tuple[sp.csr_matrix, np.ndarray]:
    """7-point 3D Poisson on an n×n×n grid; returns (A, rhs).

    Matches the structure of the reference sample problem: diagonal 6,
    off-diagonals -1, rhs = 1.  Built directly in CSR (stencil entries are
    emitted in column-sorted order per row) — no COO sort pass.
    """
    N = n * n * n
    idx = np.arange(N, dtype=np.int64)
    i = idx // (n * n)
    j = (idx // n) % n
    k = idx % n

    # Per-row candidate entries in ascending column order.
    offs = np.array([-n * n, -n, -1, 0, 1, n, n * n], dtype=np.int64)
    lo_ok = np.stack(
        [i > 0, j > 0, k > 0, np.ones(N, bool), k < n - 1, j < n - 1, i < n - 1],
        axis=1,
    )
    cols7 = idx[:, None] + offs[None, :]
    mask = lo_ok

    counts = mask.sum(axis=1)
    indptr = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = cols7[mask]
    # Diagonal is stencil slot 3; its CSR position is indptr[row] + number
    # of valid entries in slots 0..2.
    data = np.full(len(indices), -1.0, dtype=dtype)
    data[indptr[:-1] + mask[:, :3].sum(axis=1)] = 6.0
    A = sp.csr_matrix((data, indices, indptr), shape=(N, N))
    A._has_canonical_format = True
    rhs = np.ones(N, dtype=dtype)
    return A, rhs


def poisson3d_dia(n: int, dtype="float32"):
    """7-point 3D Poisson assembled *directly on the device* in DIA form
    (no host nnz-sized arrays, no upload beyond the O(n³) data itself —
    assembly is vectorized jnp work).

    The device-native analogue of the reference's in-process assembly
    (tests/sample_problem.hpp:10-84); returns (DiaMatrix, rhs jnp array).
    """
    import jax
    import jax.numpy as jnp
    from ..ops.formats import DiaMatrix

    N = n * n * n
    offsets = (-n * n, -n, -1, 0, 1, n, n * n)

    @jax.jit
    def assemble():
        idx = jnp.arange(N, dtype=jnp.int32)
        i = idx // (n * n)
        j = (idx // n) % n
        k = idx % n
        rows = [
            jnp.where(i > 0, -1.0, 0.0),
            jnp.where(j > 0, -1.0, 0.0),
            jnp.where(k > 0, -1.0, 0.0),
            jnp.full(N, 6.0),
            jnp.where(k < n - 1, -1.0, 0.0),
            jnp.where(j < n - 1, -1.0, 0.0),
            jnp.where(i < n - 1, -1.0, 0.0),
        ]
        return jnp.stack(rows).astype(dtype)

    data = assemble()
    nnz = N + 6 * N - 6 * n * n  # interior bonds counted once per side
    A = DiaMatrix(
        data=data, offsets=offsets, shape=(N, N), nnz=int(nnz),
        stencil_hint=(-1.0, -1.0, -1.0, 6.0, -1.0, -1.0, -1.0),
    )
    return A, jnp.ones(N, dtype=dtype)


def poisson2d(n: int, dtype=np.float64) -> tuple[sp.csr_matrix, np.ndarray]:
    """5-point 2D Poisson on an n×n grid."""
    N = n * n
    idx = np.arange(N)
    i, j = idx // n, idx % n
    rows, cols, vals = [idx], [idx], [np.full(N, 4.0, dtype=dtype)]
    for coord, stride in ((i, n), (j, 1)):
        for d in (-1, 1):
            m = (coord + d >= 0) & (coord + d < n)
            rows.append(idx[m])
            cols.append(idx[m] + d * stride)
            vals.append(np.full(m.sum(), -1.0, dtype=dtype))
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(N, N),
    ).tocsr()
    return A, np.ones(N, dtype=dtype)


def poisson3d_block(n: int, block: int = 2, dtype=np.float64):
    """Block-valued Poisson: kron(A, I_b) — the block analogue the reference
    sample problem produces via math::identity for static_matrix value types
    (tests/sample_problem.hpp)."""
    A, rhs = poisson3d(n, dtype)
    Ab = sp.kron(A, sp.eye(block), format="csr")
    return Ab, np.tile(rhs, block)[: A.shape[0] * block].reshape(-1)


def convection_diffusion2d(n: int, eps: float = 1e-2, dtype=np.float64):
    """Nonsymmetric convection–diffusion problem (exercises BiCGStab/GMRES
    paths the way the reference's nonsymmetric tests do)."""
    N = n * n
    h = 1.0 / (n + 1)
    idx = np.arange(N)
    i, j = idx // n, idx % n
    rows, cols, vals = [idx], [idx], [np.full(N, 4.0 * eps / h**2 + 1.0 / h, dtype=dtype)]
    stencil = {
        (-1, 0): -eps / h**2 - 1.0 / h,
        (1, 0): -eps / h**2,
        (0, -1): -eps / h**2,
        (0, 1): -eps / h**2,
    }
    for (di, dj), v in stencil.items():
        m = (i + di >= 0) & (i + di < n) & (j + dj >= 0) & (j + dj < n)
        rows.append(idx[m])
        cols.append(idx[m] + di * n + dj)
        vals.append(np.full(m.sum(), v, dtype=dtype))
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(N, N),
    ).tocsr()
    return A, np.ones(N, dtype=dtype)
