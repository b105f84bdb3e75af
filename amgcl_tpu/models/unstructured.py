"""Unstructured FEM model problems.

The reference's tutorials are driven by *unstructured* matrices
(poisson3Db: 85,623-dof FEM Poisson with 2.37M nnz,
reference: docs/tutorial/poisson3Db.rst:12-20; Serena: 1.39M-dof 3×3
block elasticity).  Those MatrixMarket files are not available offline,
so these generators produce honest same-class stand-ins: P1 finite
elements on a Delaunay tetrahedralization of perturbed points — truly
unstructured sparsity (no usable diagonal structure), FEM-graph
connectivity, SPD, ~27 nnz/row in 3D.

Rows come out in mesh-point order (spatially random), like a real mesh
file; callers reorder (Cuthill–McKee) for banded device formats.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _fem_p1_laplacian(points: np.ndarray, cells: np.ndarray) -> sp.csr_matrix:
    """Assemble the P1 stiffness matrix  K_ij = ∫ ∇φ_i · ∇φ_j  over a
    simplicial mesh (2D triangles or 3D tets), vectorized over cells."""
    npt, dim = points.shape
    nv = dim + 1                      # vertices per simplex
    X = points[cells]                 # (nc, nv, dim)
    # Edge matrix relative to vertex 0: E = [x1-x0, ..., xd-x0]  (nc, dim, dim)
    E = np.transpose(X[:, 1:, :] - X[:, :1, :], (0, 2, 1))
    import math

    detE = np.linalg.det(E)
    vol = np.abs(detE) / math.factorial(dim)
    good = vol > 1e-14 * np.median(vol)

    Einv = np.linalg.inv(E[good])     # (ncg, dim, dim)
    # Gradients: ∇φ_k for k=1..d rows of Einv^T; ∇φ_0 = -Σ others.
    G = np.transpose(Einv, (0, 2, 1))            # (ncg, dim, dim) rows=grads 1..d
    g0 = -G.sum(axis=1, keepdims=True)           # (ncg, 1, dim)
    grads = np.concatenate([g0, G], axis=1)      # (ncg, nv, dim)
    Ke = np.einsum("cad,cbd->cab", grads, grads) * vol[good, None, None]

    cg = cells[good]
    rows = np.repeat(cg, nv, axis=1).ravel()
    cols = np.tile(cg, (1, nv)).ravel()
    K = sp.coo_matrix((Ke.ravel(), (rows, cols)), shape=(npt, npt)).tocsr()
    K.sum_duplicates()
    return K


def fem_poisson_3d(
    npoints: int = 85_000, seed: int = 7, dtype=np.float64
) -> tuple[sp.csr_matrix, np.ndarray]:
    """Unstructured 3D FEM Poisson, the poisson3Db stand-in
    (reference: docs/tutorial/poisson3Db.rst:12 — 85,623 rows, 2,374,949
    nnz).  Points are a jittered lattice (well-shaped Delaunay tets, like
    a real mesher's output); boundary conditions are handled by adding a
    mass-like positive shift on near-boundary points so the operator is
    SPD nonsingular, matching the problem class (interior Poisson +
    Dirichlet elimination).

    Returns (A, rhs) with A in *mesh order* (unstructured row order).
    """
    rng = np.random.default_rng(seed)
    m = int(round(npoints ** (1.0 / 3.0)))
    # jittered lattice: |jitter| < 0.45 h keeps tets well-shaped
    g = np.linspace(0.0, 1.0, m)
    P = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    h = 1.0 / (m - 1)
    P = P + rng.uniform(-0.45 * h, 0.45 * h, P.shape)
    extra = npoints - P.shape[0]
    if extra > 0:
        P = np.concatenate([P, rng.uniform(0, 1, (extra, 3))], axis=0)
    # shuffle: mesh files have no exploitable row order
    P = P[rng.permutation(P.shape[0])]

    from scipy.spatial import Delaunay

    tri = Delaunay(P)
    A = _fem_p1_laplacian(P, tri.simplices.astype(np.int64))

    # Dirichlet-like shift on the boundary shell (keeps SPD, removes the
    # constant nullspace — same spectral class as eliminated Dirichlet).
    onb = (P.min(axis=1) < h) | (P.max(axis=1) > 1 - h)
    shift = sp.diags(np.where(onb, A.diagonal() * 0.5, 0.0))
    A = sp.csr_matrix(A + shift)
    A.sort_indices()
    A = A.astype(dtype)
    rhs = np.ones(A.shape[0], dtype=dtype)
    return A, rhs


def fem_elasticity_3d(
    npoints: int = 80_000, seed: int = 13, E: float = 1.0, nu: float = 0.3,
    dtype=np.float64,
) -> tuple[sp.csr_matrix, np.ndarray, np.ndarray]:
    """Unstructured 3D P1 linear elasticity — the Serena stand-in
    (reference: docs/tutorial/Serena.rst:12 — 1,391,349 rows of 3×3-block
    gas-reservoir elasticity; the matrix file is not available offline).
    Same jittered-lattice Delaunay mesh as fem_poisson_3d, 3 dof/node,
    isotropic Hooke law; per-element stiffness

        Ke[ai, bj] = V (λ ∂φa/∂xi ∂φb/∂xj + μ ∂φa/∂xj ∂φb/∂xi
                        + μ δij ∇φa·∇φb)

    Rows come out in mesh-point order (shuffled), interleaved dof
    (node i → rows 3i..3i+2) — a genuinely unstructured 3×3 BSR system.
    The bottom face gets a Dirichlet-like diagonal shift (SPD,
    rigid-body modes removed).

    Returns (A, rhs, coords) — coords (n_nodes, 3) for rigid-body-mode
    nullspace construction (reference: coarsening/rigid_body_modes.hpp).
    """
    rng = np.random.default_rng(seed)
    m = int(round(npoints ** (1.0 / 3.0)))
    g = np.linspace(0.0, 1.0, m)
    P = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    h = 1.0 / (m - 1)
    P = P + rng.uniform(-0.45 * h, 0.45 * h, P.shape)
    extra = npoints - P.shape[0]
    if extra > 0:
        P = np.concatenate([P, rng.uniform(0, 1, (extra, 3))], axis=0)
    P = P[rng.permutation(P.shape[0])]

    from scipy.spatial import Delaunay

    tri = Delaunay(P)
    cells = tri.simplices.astype(np.int64)

    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    npt = P.shape[0]
    eye3 = np.eye(3)
    # Chunked assembly: each cell contributes 144 COO entries; a
    # monolithic triplet buffer at 1M+ dof means several GB of fresh
    # pages (this class of sandboxed host faults them at ~10 MB/s).
    # Accumulating per-chunk CSRs keeps the high-water mark at one chunk
    # plus the growing matrix.
    K = sp.csr_matrix((3 * npt, 3 * npt), dtype=np.float64)
    step = 300_000
    for c0 in range(0, cells.shape[0], step):
        cc = cells[c0 : c0 + step]
        X = P[cc]
        Ee = np.transpose(X[:, 1:, :] - X[:, :1, :], (0, 2, 1))
        vol = np.abs(np.linalg.det(Ee)) / 6.0
        good = vol > 1e-12 * np.max(vol)
        Einv = np.linalg.inv(Ee[good])
        G = np.transpose(Einv, (0, 2, 1))
        g0 = -G.sum(axis=1, keepdims=True)
        grads = np.concatenate([g0, G], axis=1)      # (nc, 4, 3)
        v = vol[good]
        gg = np.einsum("cad,cbd->cab", grads, grads)  # ∇φa·∇φb
        # Ke (nc, 4, 3, 4, 3)
        Ke = (
            lam * np.einsum("cai,cbj->caibj", grads, grads)
            + mu * np.einsum("caj,cbi->caibj", grads, grads)
            + mu * gg[:, :, None, :, None] * eye3[None, :, None, :]
        ) * v[:, None, None, None, None]

        cg = cells[c0 : c0 + step][good]
        dof = (
            3 * cg[:, :, None] + np.arange(3)[None, None, :]
        ).reshape(-1, 12).astype(np.int32)
        rows = np.repeat(dof, 12, axis=1).ravel()
        cols = np.tile(dof, (1, 12)).ravel()
        Kc = sp.coo_matrix(
            (Ke.reshape(-1), (rows, cols)), shape=(3 * npt, 3 * npt)
        ).tocsr()
        K = K + Kc
    K.sum_duplicates()

    onb = P[:, 2] < h                                # clamp the bottom face
    shift = np.where(np.repeat(onb, 3), K.diagonal() * 0.5, 0.0)
    K = sp.csr_matrix(K + sp.diags(shift))
    K.sort_indices()
    K = K.astype(dtype)
    rhs = np.zeros(K.shape[0], dtype=dtype)
    rhs[2::3] = -1.0                                 # gravity load
    return K, rhs, P


def fem_poisson_2d(
    npoints: int = 20_000, seed: int = 11, dtype=np.float64
) -> tuple[sp.csr_matrix, np.ndarray]:
    """Unstructured 2D FEM Poisson on a jittered triangulated square."""
    rng = np.random.default_rng(seed)
    m = int(round(npoints ** 0.5))
    g = np.linspace(0.0, 1.0, m)
    P = np.stack(np.meshgrid(g, g, indexing="ij"), axis=-1).reshape(-1, 2)
    h = 1.0 / (m - 1)
    P = P + rng.uniform(-0.4 * h, 0.4 * h, P.shape)
    extra = npoints - P.shape[0]
    if extra > 0:
        P = np.concatenate([P, rng.uniform(0, 1, (extra, 2))], axis=0)
    P = P[rng.permutation(P.shape[0])]

    from scipy.spatial import Delaunay

    tri = Delaunay(P)
    A = _fem_p1_laplacian(P, tri.simplices.astype(np.int64))
    onb = (P.min(axis=1) < h) | (P.max(axis=1) > 1 - h)
    A = sp.csr_matrix(A + sp.diags(np.where(onb, A.diagonal() * 0.5, 0.0)))
    A.sort_indices()
    A = A.astype(dtype)
    return A, np.ones(A.shape[0], dtype=dtype)
