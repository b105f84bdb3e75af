"""Synthetic coupled-physics model problems for the composite
preconditioners (the roles of the reference tutorials 3.CoupCons3D,
4.Stokes and the reservoir CPR examples)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .poisson import poisson2d


def stokes2d(n: int, eps: float = 1e-2, seed: int = 0):
    """Stabilized equal-order Stokes saddle-point system on an n×n grid.

    Velocity block = 2 stacked 2D Poissons (u_x, u_y); B = structured
    discrete gradient (each pressure node couples to the ±x neighbours
    of u_x and ±y neighbours of u_y with ∓1/2 — central differences);
    pressure block = -eps·I (equal-order stabilization).  Returns
    (A, rhs, pmask) with pressure dofs last."""
    del seed  # deterministic structured coupling
    K1, _ = poisson2d(n)
    nu1 = K1.shape[0]
    K = sp.block_diag([K1, K1], format="csr")
    nu = 2 * nu1
    npr = nu1

    idx = np.arange(nu1)
    i, j = idx // n, idx % n
    rows, cols, vals = [], [], []
    # ∂/∂x on the u_x block
    for d, s in ((-1, -0.5), (1, 0.5)):
        m = (i + d >= 0) & (i + d < n)
        rows.append(idx[m] + d * n)          # u_x dof (first block)
        cols.append(idx[m])
        vals.append(np.full(m.sum(), s))
    # ∂/∂y on the u_y block
    for d, s in ((-1, -0.5), (1, 0.5)):
        m = (j + d >= 0) & (j + d < n)
        rows.append(nu1 + idx[m] + d)        # u_y dof (second block)
        cols.append(idx[m])
        vals.append(np.full(m.sum(), s))
    B = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nu, npr),
    ).tocsr()

    C = -eps * sp.eye(npr)
    A = sp.bmat([[K, B], [B.T, C]], format="csr")
    A.sort_indices()
    pmask = np.zeros(nu + npr, dtype=bool)
    pmask[nu:] = True
    rhs = np.ones(nu + npr)
    return A, rhs, pmask


def stokes3d(n: int, eps: float = 1e-2):
    """Stabilized equal-order 3D Stokes on an n×n×n grid — the scale
    class of the reference's Stokes tutorial (docs/tutorial/Stokes.rst:
    ucube, 554,496 dof): dof = 4n³ (3 velocity components + pressure),
    n = 52 gives 562,432.  Velocity block = 3 stacked 3D Poissons; B =
    central-difference gradients; pressure block = −eps·I.  Returns
    (A, rhs, pmask) with pressure dofs last."""
    from .poisson import poisson3d

    K1, _ = poisson3d(n)
    nu1 = K1.shape[0]
    K = sp.block_diag([K1, K1, K1], format="csr")
    nu = 3 * nu1
    npr = nu1

    idx = np.arange(nu1)
    i = idx // (n * n)
    j = (idx // n) % n
    k = idx % n
    strides = (n * n, n, 1)
    coords = (i, j, k)
    rows, cols, vals = [], [], []
    for comp in range(3):
        st = strides[comp]
        c = coords[comp]
        for d, s in ((-1, -0.5), (1, 0.5)):
            m = (c + d >= 0) & (c + d < n)
            rows.append(comp * nu1 + idx[m] + d * st)
            cols.append(idx[m])
            vals.append(np.full(int(m.sum()), s))
    B = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nu, npr),
    ).tocsr()

    C = -eps * sp.eye(npr)
    A = sp.bmat([[K, B], [B.T, C]], format="csr")
    A.sort_indices()
    pmask = np.zeros(nu + npr, dtype=bool)
    pmask[nu:] = True
    rhs = np.ones(nu + npr)
    return A, rhs, pmask


def reservoir2d(n: int, seed: int = 0):
    """Two-phase reservoir-like block system (block size 2: pressure,
    saturation per cell) for CPR testing — pressure sub-block elliptic,
    saturation transport-like, offdiagonal coupling."""
    P, _ = poisson2d(n)
    N = P.shape[0]
    # pressure rows: poisson on p (+ compressibility mass term) + weak
    # coupling to own s; saturation rows: identity-dominant + weak
    # coupling to own p.  The couplings are sized so the quasi-IMPES
    # pressure system stays uniformly elliptic: App ∝ 2(P + 0.3 I) −
    # 0.01 I — with the original (0.5 p-coupling, no mass term) values
    # App ∝ 2P − 0.25 I went indefinite once the Poisson spectrum's low
    # end (≈ 2π²/n²) dropped below 0.125, i.e. for any n ≳ 13.
    Ep = sp.kron(P, np.array([[1.0, 0.0], [0.0, 0.0]]))
    Es = sp.kron(sp.eye(N), np.array([[0.3, 0.2], [0.1, 2.0]]))
    # weak neighbour coupling in saturation
    Et = sp.kron(P - sp.diags(P.diagonal()), np.array([[0.0, 0.0], [0.0, 0.05]]))
    A = sp.csr_matrix(Ep + Es + Et)
    A.sort_indices()
    rhs = np.ones(2 * N)
    return A, rhs
