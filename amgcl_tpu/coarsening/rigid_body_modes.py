"""Rigid body modes — near-nullspace vectors for elasticity.

Capability parity with the reference (amgcl/coarsening/rigid_body_modes.hpp:
45-128): from node coordinates build the 3 (2D) or 6 (3D) rigid-body modes
(translations + rotations), the near-nullspace basis that makes smoothed
aggregation effective on elasticity problems (used by tutorial
5.Nullspace)."""

from __future__ import annotations

import numpy as np


def rigid_body_modes(ndim: int, coo: np.ndarray, transpose: bool = False):
    """coo: flat coordinate array (len = ndim * nnodes, interleaved like the
    reference) or (nnodes, ndim).  Returns B of shape (ndim*nnodes, nmodes)
    with nmodes = 3 (2D) or 6 (3D)."""
    coo = np.asarray(coo, dtype=np.float64)
    if coo.ndim == 1:
        coo = coo.reshape(-1, ndim)
    nnodes = coo.shape[0]
    n = ndim * nnodes

    if ndim == 2:
        nmodes = 3
        B = np.zeros((n, nmodes))
        x, y = coo[:, 0], coo[:, 1]
        B[0::2, 0] = 1.0
        B[1::2, 1] = 1.0
        B[0::2, 2] = -y
        B[1::2, 2] = x
    elif ndim == 3:
        nmodes = 6
        B = np.zeros((n, nmodes))
        x, y, z = coo[:, 0], coo[:, 1], coo[:, 2]
        B[0::3, 0] = 1.0
        B[1::3, 1] = 1.0
        B[2::3, 2] = 1.0
        # rotations (reference's convention: around z, x, y)
        B[0::3, 3] = -y
        B[1::3, 3] = x
        B[1::3, 4] = -z
        B[2::3, 4] = y
        B[0::3, 5] = z
        B[2::3, 5] = -x
    else:
        raise ValueError("ndim must be 2 or 3")

    # Orthonormalize (the reference QR-normalizes per aggregate later; a
    # globally orthonormal basis improves conditioning of the coarse QR).
    Q, _ = np.linalg.qr(B)
    return Q
