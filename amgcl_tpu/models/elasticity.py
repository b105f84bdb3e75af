"""2D linear elasticity (Q1 FEM, plane stress) — the model family behind
the reference's nullspace tutorial (tutorial/5.Nullspace): vector-valued
problem whose near-nullspace is the rigid body modes."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _q1_stiffness(E=1.0, nu=0.3):
    """8x8 element stiffness for a unit square Q1 element, plane stress."""
    C = (E / (1 - nu * nu)) * np.array(
        [[1, nu, 0], [nu, 1, 0], [0, 0, (1 - nu) / 2]]
    )
    gp = np.array([-1, 1]) / np.sqrt(3)
    Ke = np.zeros((8, 8))
    corners = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    for xi in gp:
        for eta in gp:
            dN = np.array(
                [
                    [-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)],
                    [-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)],
                ]
            ) / 4.0
            # unit square: jacobian = I/2 (element size 1) → scale by 2
            dN = dN * 2.0
            B = np.zeros((3, 8))
            B[0, 0::2] = dN[0]
            B[1, 1::2] = dN[1]
            B[2, 0::2] = dN[1]
            B[2, 1::2] = dN[0]
            Ke += B.T @ C @ B * 0.25  # det(J)*w = (1/4)·1
    return Ke


def elasticity2d(n: int, E=1.0, nu=0.3):
    """Assemble 2D elasticity on an n×n node grid, clamped on the left
    edge.  Returns (A csr, rhs, coords (nnodes,2))."""
    Ke = _q1_stiffness(E, nu)
    nodes = n * n
    ndof = 2 * nodes

    # element connectivity
    ex, ey = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    n0 = (ex * n + ey).ravel()
    conn = np.stack([n0, n0 + n, n0 + n + 1, n0 + 1], axis=1)  # (ne, 4)
    dofs = np.stack([2 * conn, 2 * conn + 1], axis=2).reshape(-1, 8)

    ne = dofs.shape[0]
    rows = np.repeat(dofs, 8, axis=1).ravel()
    cols = np.tile(dofs, (1, 8)).ravel()
    vals = np.tile(Ke.ravel(), ne)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(ndof, ndof)).tocsr()

    # Dirichlet: clamp nodes with x == 0
    xi = np.arange(nodes) // n
    clamped = np.nonzero(xi == 0)[0]
    cd = np.concatenate([2 * clamped, 2 * clamped + 1])
    keep = np.ones(ndof, dtype=bool)
    keep[cd] = False
    # symmetric elimination
    mask = sp.diags(keep.astype(float))
    A = sp.csr_matrix(mask @ A @ mask + sp.diags((~keep).astype(float)))
    A.sum_duplicates()
    A.sort_indices()

    rhs = np.zeros(ndof)
    rhs[1::2] = -1e-3  # downward load
    rhs[~keep] = 0.0

    coords = np.stack(
        [np.arange(nodes) // n, np.arange(nodes) % n], axis=1
    ).astype(float) / (n - 1)
    return A, rhs, coords
