"""Distributed subdomain deflation.

Capability parity with mpi::subdomain_deflation
(amgcl/mpi/subdomain_deflation.hpp:54-610): a two-level method where each
shard contributes deflation vector(s) Z (constant per subdomain by
default), the coarse matrix E = Zᵀ A Z is small and replicated, and the
Krylov solver runs on the projected operator

    P y = y − A Z E⁻¹ Zᵀ y

with a per-shard local preconditioner.  On TPU the Zᵀ·v products are
per-shard reductions + an all_gather of one scalar per shard (Z is the
subdomain indicator), E⁻¹ is a tiny replicated dense solve — exactly the
role of the reference's distributed direct solver on E.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp


def make_deflation_ops(A: sp.csr_matrix, S: int, axis: str, dtype):
    """Host-side pieces for constant (per-subdomain) deflation over S
    equal row slabs: returns (AZ_stacked (S, n_loc, S), Einv (S, S))."""
    n = A.shape[0]
    n_loc = n // S
    Z = np.zeros((n, S))
    for s in range(S):
        Z[s * n_loc : (s + 1) * n_loc, s] = 1.0
    AZ = np.asarray((A @ Z))
    E = Z.T @ AZ
    Einv = np.linalg.inv(E)
    AZ_stacked = AZ.reshape(S, n_loc, S)
    return (
        jnp.asarray(AZ_stacked, dtype=dtype),
        jnp.asarray(Einv, dtype=dtype),
    )


def make_project(AZ_loc, Einv, axis: str):
    """The deflation projector P(y) = y − (AZ)_loc E⁻¹ Zᵀ y, usable inside
    shard_map. Zᵀ y = per-shard sums, assembled with psum of one-hot
    contributions (the mpi::inner_product-style collective)."""
    S = Einv.shape[0]

    def project(y):
        my = jax.lax.axis_index(axis)
        local_sum = jnp.sum(y)
        zty = jax.lax.psum(
            (jnp.arange(S) == my) * local_sum, axis
        )                                    # (S,) replicated
        lam = Einv @ zty
        return y - AZ_loc @ lam

    return project
