"""Sparse matrix–vector products on the planar block-ELL format.

These are the TPU equivalents of the reference backend primitives
backend::spmv / backend::residual (reference: amgcl/backend/interface.hpp:
191-420 and amgcl/backend/detail/matrix_ops.hpp).  Everything here is
jit-friendly: static shapes, one gather + fused elementwise reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .formats import (
    SparseMatrix, DiaMatrix, BlockDiaMatrix, HybridEllMatrix,
)


def _pallas_ok() -> bool:
    """Use the Pallas streaming kernel on real TPU backends only (tests
    force CPU, where interpret mode would be slower than the XLA path)."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


_PALLAS_WINDOW_LIMIT = 4 << 20   # elements of x window per tile (VMEM)


def _use_pallas(A: DiaMatrix, x: jax.Array) -> bool:
    n, m = A.shape
    if n != m or A.data.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    halo = max(max(A.offsets), -min(A.offsets), 0)
    if 8192 + 2 * halo > _PALLAS_WINDOW_LIMIT:
        return False
    return _pallas_ok()


def _spmv_dia(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """Shift-based SpMV: D static slices of a zero-padded x, multiplied and
    accumulated — full-lane VPU work, no gathers, HBM-roofline on TPU."""
    n, m = A.shape
    out_dtype = x.dtype
    xc = x.astype(A.data.dtype)
    # Pad so every shifted window xp[L+d : L+d+n] is in range; out-of-range
    # slots multiply stored zeros.
    L = max(0, -min(A.offsets))
    R = max(0, (n - 1) + max(A.offsets) - (m - 1))
    xp = jnp.pad(xc, (L, R))
    # data may be pre-padded wider than n (prepad_pallas hoisting)
    data = (
        A.data if A.data.shape[1] == n
        else jax.lax.slice(A.data, (0, 0), (A.data.shape[0], n))
    )
    y = jnp.zeros(n, dtype=A.data.dtype)
    for k, d in enumerate(A.offsets):
        seg = jax.lax.slice(xp, (L + d,), (L + d + n,))
        y = y + data[k] * seg
    return y.astype(out_dtype)


def _spmv_block_dia(A: BlockDiaMatrix, x: jax.Array) -> jax.Array:
    """Gather-free block SpMV: D shifted b×b block products, unrolled as
    D·b² full-lane VPU multiply-adds over the long nb axis (an einsum
    here lowers to tiny-contraction MXU dots and runs ~2.5x slower)."""
    D, b, _, nb = A.data.shape
    out_dtype = x.dtype
    xc = x.astype(A.data.dtype).reshape(nb, b).T     # (b, nb)
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    xp = jnp.pad(xc, ((0, 0), (L, R)))
    ys = [jnp.zeros(nb, dtype=A.data.dtype) for _ in range(b)]
    for k, d in enumerate(A.offsets):
        seg = jax.lax.slice(xp, (0, L + d), (b, L + d + nb))   # (b, nb)
        for a in range(b):
            acc = ys[a]
            for c in range(b):
                acc = acc + A.data[k, a, c] * seg[c]
            ys[a] = acc
    return jnp.stack(ys).T.reshape(-1).astype(out_dtype)


def spmv(A, x: jax.Array) -> jax.Array:
    """y = A @ x.

    x has scalar length A.shape[1]; result has scalar length A.shape[0].
    Accepts x of any float dtype; computes in A.dtype (cast at the
    boundary), which implements the mixed-precision coupling of the
    reference's backends_compatible machinery
    (amgcl/backend/interface.hpp:434-443).
    """
    if isinstance(A, DiaMatrix):
        if x.shape[0] != A.shape[1] and A.shape[0] == A.shape[1]:
            # persistent padded-vector layout (len = common tile multiple,
            # zeros beyond row n): zero-copy kernel on TPU; on CPU the
            # layout is preserved by slice/compute/pad (tests + fallback)
            if (
                _pallas_ok()
                and A.data.dtype in (jnp.float32, jnp.bfloat16)
            ):
                from .pallas_spmv import spmv_dia_padded

                return spmv_dia_padded(A, x)
            # f64 outer operators (refine's defect correction, ~2 per
            # OUTER pass) and CPU: slice/compute/pad preserves the layout
            n = A.shape[0]
            y = _spmv_dia(A, x[:n])
            return jnp.pad(y, (0, x.shape[0] - n))
        if _use_pallas(A, x):
            from .pallas_spmv import spmv_dia_pallas

            return spmv_dia_pallas(A, x)
        return _spmv_dia(A, x)
    if isinstance(A, BlockDiaMatrix):
        return _spmv_block_dia(A, x)
    from .pallas_sell import SellMatrix
    from .pallas_sell2 import Sell2Matrix, Sell2F64Matrix
    from .pallas_bsell import BlockSellMatrix
    if isinstance(A, (SellMatrix, Sell2Matrix, Sell2F64Matrix,
                      BlockSellMatrix)):
        return A.spmv(x)
    if isinstance(A, HybridEllMatrix):
        out_dtype = x.dtype
        xc = x.astype(A.dtype)
        y = jnp.sum(A.d0 * xc[A.c0], axis=0)         # sorted row order
        for d, c in A.tiers:
            # tiers cover a static prefix of the sorted rows: a slice
            # update, never a scatter (TPU scatters are gather-slow)
            mt = d.shape[1]
            y = y.at[:mt].add(jnp.sum(d * xc[c], axis=0))
        return y[A.inv_perm].astype(out_dtype)
    K, b, _, nb = A.data.shape
    out_dtype = x.dtype
    xc = x.astype(A.data.dtype)
    if b == 1:
        xg = xc[A.cols]                      # (K, nb) gather
        y = jnp.sum(A.data[:, 0, 0, :] * xg, axis=0)
        return y.astype(out_dtype)
    xb = xc.reshape(-1, b)                   # (nbc, b)
    xg = xb[A.cols]                          # (K, nb, b)
    y = jnp.einsum("kabn,knb->na", A.data, xg)
    return y.reshape(-1).astype(out_dtype)


def spmv_t(A: SparseMatrix, x: jax.Array) -> jax.Array:
    """y = A.T @ x via scatter-add (no transposed copy needed).

    Used where the reference stores an explicit R = P^T; we keep explicit
    transposes for hierarchy operators (built at setup) but expose this for
    matrix-free uses.
    """
    if isinstance(A, HybridEllMatrix):
        n, m = A.shape
        # x in sorted-row order: x_sorted[inv_perm[i]] = x[i]
        xsort = jnp.zeros(n, A.dtype).at[A.inv_perm].set(x.astype(A.dtype))
        y = jnp.zeros(m, dtype=A.dtype)
        y = y.at[A.c0.ravel()].add((A.d0 * xsort[None, :]).ravel())
        for d, c in A.tiers:
            mt = d.shape[1]
            y = y.at[c.ravel()].add((d * xsort[None, :mt]).ravel())
        return y.astype(x.dtype)
    K, b, _, nb = A.data.shape
    nbc = A.shape[1] // b
    xc = x.astype(A.data.dtype)
    if b == 1:
        contrib = A.data[:, 0, 0, :] * xc[None, :]   # (K, nb)
        y = jnp.zeros(nbc, dtype=A.data.dtype)
        y = y.at[A.cols.ravel()].add(contrib.ravel())
        return y.astype(x.dtype)
    xb = xc.reshape(nb, b)
    contrib = jnp.einsum("kabn,na->knb", A.data, xb)  # (K, nb, b)
    y = jnp.zeros((nbc, b), dtype=A.data.dtype)
    y = y.at[A.cols.reshape(-1)].add(contrib.reshape(-1, b))
    return y.reshape(-1).astype(x.dtype)


def residual(rhs: jax.Array, A: SparseMatrix, x: jax.Array) -> jax.Array:
    """r = rhs - A x  (reference: backend::residual,
    amgcl/backend/interface.hpp:320)."""
    return rhs - spmv(A, x)
