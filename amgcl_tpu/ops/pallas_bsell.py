"""Block-valued SELL Pallas kernel (BSR unstructured SpMV on TPU).

The reference dedicates 1031 lines of generated OpenCL kernels to making
its GPU backend handle ``static_matrix`` block values on unstructured
matrices (amgcl/backend/vexcl_static_matrix.hpp:1) — the Serena (3x3)
and CoupCons3D (4x4) tutorial class.  On TPU the same capability falls
out of the SELL v2 design (ops/pallas_sell2.py) applied to the *block*
pattern:

* The window/class analysis runs on the block-column graph: a b-block
  matrix has b-fold fewer columns, so windows are fewer and denser than
  the scalar packing of the same matrix.
* x lives in VMEM as b component planes (component c of block j at
  subrow c*S_pad + j//128); each 128-wide window is gathered ONCE per
  source component and reused by all b destination components — gather
  work is b x scalar while FLOP work is b^2 x scalar, so the kernel gets
  *more* arithmetic per gather than the scalar one (gathers are the TPU
  bottleneck; see DESIGN.md "Hardware model").
* Values are packed as b^2 planar slot arrays sharing one ``enc``/
  ``bases`` table (the scalar packer runs once on the pattern carrying
  block ids, and the planes are filled by id lookup).

Scalar case b=1 reduces exactly to the v2 kernel; this module requires
b >= 2 and W = 128 (block windows are narrow already).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sell import _lane_gather
from .pallas_sell2 import pack_sell2


# ----------------------------------------------------------------------
# host-side packing
# ----------------------------------------------------------------------

def pack_bsell(A, block: int, R: int = 4, max_classes: int = 6,
               nw_cap: int = 64):
    """Pack a scalar CSR (shape divisible by ``block``) into the block
    SELL layout.  Returns None when the block pattern exceeds the window
    cap (caller falls back to block-ELL), else a dict like pack_sell2's
    with per-class ``data`` of shape (b*b*K8, Gp*128) — plane (r*b+c)
    holds value component [r, c] of each slot's block."""
    b = int(block)
    if b < 2:
        return None
    A = sp.csr_matrix(A)
    n, m = A.shape
    if n % b or m % b or n == 0 or A.nnz == 0:
        return None
    B = sp.bsr_matrix(A, blocksize=(b, b))
    B.sort_indices()
    nnzb = B.data.shape[0]
    # pattern CSR over block rows/cols, data = 1-based block id (exact in
    # f64 up to 2^53)
    pat = sp.csr_matrix(
        (np.arange(1, nnzb + 1, dtype=np.float64),
         B.indices.copy(), B.indptr.copy()),
        shape=(n // b, m // b),
    )
    p = pack_sell2(pat, W=128, R=R, max_classes=max_classes, nw_cap=nw_cap)
    if p is None:
        return None
    # id 0 = padding -> zero block
    bdata = np.concatenate(
        [np.zeros((1, b, b), dtype=np.float64), B.data.astype(np.float64)]
    )
    for c in p["classes"]:
        ids = np.rint(c["data"]).astype(np.int64)          # (K8, Gp*128)
        K8, N = ids.shape
        planes = bdata[ids]                                # (K8, N, b, b)
        c["data"] = np.ascontiguousarray(
            np.transpose(planes, (2, 3, 0, 1)).reshape(b * b * K8, N)
        )
    p["b"] = b
    p["n"], p["m"] = n, m                                  # scalar shape
    p["nb"], p["mb"] = n // b, m // b
    p["nnz"] = int(A.nnz)
    p["nnz_stored"] = nnzb * b * b
    return p


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------

def _bsell_kernel(R, b, K8, nw, S_pad,
                  data_ref, enc_ref, bases_ref, x_ref, y_ref):
    """One program = R block-row groups of one class.  Everything static:
    per-band window counts ``nw``, block size b, class band count.
    x_ref is (b*S_pad, 128): component c of block column j at subrow
    c*S_pad + j//128, lane j%128."""
    off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
    B = len(nw)
    # bf16 value planes compute in f32 (see pallas_sell2._sell2_kernel)
    dt = data_ref.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    for r in range(R):
        lsl = slice(r * 128, (r + 1) * 128)
        accs = [jnp.zeros((1, 128), cdt) for _ in range(b)]
        for band in range(B):
            if nw[band] == 0:
                continue
            e = enc_ref[band * 8 : band * 8 + 8, lsl]
            lo = e & jnp.int32(127)
            hs = jax.lax.shift_right_logical(e, jnp.int32(7))
            gaccs = [jnp.zeros((8, 128), cdt) for _ in range(b)]
            for w in range(nw[band]):
                t = bases_ref[0, r, off[band] + w]
                for c in range(b):
                    row = x_ref[pl.ds(t + jnp.int32(c * S_pad), 1), :]
                    Tv = jnp.broadcast_to(row, (8, 128))
                    g = _lane_gather(Tv, lo)
                    if nw[band] == 1:
                        gaccs[c] = g
                    else:
                        gaccs[c] = gaccs[c] + jnp.where(
                            hs == jnp.int32(w), g, 0.0
                        )
            for rr in range(b):
                for c in range(b):
                    d = data_ref[
                        (rr * b + c) * K8 + band * 8 :
                        (rr * b + c) * K8 + band * 8 + 8,
                        lsl,
                    ]
                    if dt == jnp.bfloat16:
                        d = d.astype(cdt)
                    accs[rr] = accs[rr] + jnp.sum(
                        d * gaccs[c], axis=0, keepdims=True
                    )
        for rr in range(b):
            y_ref[rr : rr + 1, lsl] = accs[rr]


def bsell_spmv_pallas(meta, x: jax.Array, class_arrays,
                      interpret: bool = False) -> jax.Array:
    """y = A @ x for a packed block-SELL matrix (x, y scalar-interleaved
    as usual: x[j*b + c] = component c of block j)."""
    n, m, b, S_pad, R = (meta[k] for k in ("n", "m", "b", "S_pad", "R"))
    mb = meta["mb"]
    dt = class_arrays[0][0].dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    xc = x.astype(cdt).reshape(mb, b).T                    # (b, mb)
    x2 = jnp.pad(xc, ((0, 0), (0, S_pad * 128 - mb)))
    x2 = x2.reshape(b * S_pad, 128)

    from .pallas_sell2 import _fit_R

    outs = []
    for spec, (data, enc, bases) in zip(meta["classes"], class_arrays):
        K8, Gp, Gc, nw = spec["K8"], spec["Gp"], spec["G"], spec["nw"]
        L = bases.shape[1]
        # dense block-row classes overflow the 16 MiB scoped-VMEM limit
        # at R=4 (data block is b*b*K8 sublanes tall) — shrink R per
        # class until the double-buffered streams fit alongside the
        # whole-array residents (x2 is b planes of S_pad·128 f32: several
        # MiB at Serena scale — the 1M-dof run OOMed without this)
        Rc = _fit_R(
            R, Gp,
            (data.dtype.itemsize * b * b + 4) * K8 * 128,
            resident_bytes=x2.nbytes + bases.nbytes
            + b * R * 128 * jnp.dtype(cdt).itemsize,
        )
        grid = Gp // Rc
        # Mosaic requires SMEM block sublane dims divisible by 8 (or
        # equal to the array dim): carry the window table as
        # (grid, Rp, L) with per-program rows padded to a sublane
        # multiple (see pallas_sell2.sell2_spmv_pallas).
        Rp = -(-Rc // 8) * 8
        b3 = bases.reshape(grid, Rc, L)
        if Rp != Rc:
            b3 = jnp.pad(b3, ((0, 0), (0, Rp - Rc), (0, 0)))
        y = pl.pallas_call(
            partial(_bsell_kernel, Rc, b, K8, nw, S_pad),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (b * b * K8, Rc * 128), lambda g: (jnp.int32(0), g)
                ),
                pl.BlockSpec((K8, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec(
                    (1, Rp, L),
                    lambda g: (g, jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (b * S_pad, 128),
                    lambda g: (jnp.int32(0), jnp.int32(0)),
                ),
            ],
            out_specs=pl.BlockSpec(
                (b, Rc * 128), lambda g: (jnp.int32(0), g)
            ),
            out_shape=jax.ShapeDtypeStruct((b, Gp * 128), cdt),
            interpret=interpret,
        )(data, enc, b3, x2)
        outs.append(y[:, : Gc * 128])
    out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    # (b, nb_padless) component-major -> scalar interleaved
    return out.T.reshape(-1)[:n].astype(x.dtype)


# ----------------------------------------------------------------------
# format wrapper
# ----------------------------------------------------------------------

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["arrays"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class BlockSellMatrix:
    """Block-valued classed vreg-windowed sliced-ELL matrix.  Selected on
    TPU for unstructured block operators (Serena/CoupCons3D class) when
    the block pattern's windows stay under the cap."""

    arrays: tuple          # ((data, enc, bases), ...) per class
    meta: tuple            # hashable static proxy of the pack dict

    @property
    def _m(self):
        d = dict(self.meta)
        d["classes"] = [dict(c) for c in d["classes"]]
        return d

    @property
    def shape(self):
        d = dict(self.meta)
        return (d["n"], d["m"])

    @property
    def dtype(self):
        return self.arrays[0][0].dtype

    @property
    def block(self):
        return dict(self.meta)["b"]

    @property
    def nnz(self):
        return dict(self.meta)["nnz"]

    @property
    def nbytes(self):
        return sum(
            d.size * d.dtype.itemsize + e.size * 4 + bs.size * 4
            for d, e, bs in self.arrays
        )

    def astype(self, dtype):
        return dataclasses.replace(
            self,
            arrays=tuple(
                (d.astype(dtype), e, bs) for d, e, bs in self.arrays
            ),
        )

    @staticmethod
    def from_scipy(A, block: int, dtype=jnp.float32, R: int = 4,
                   max_classes: int = 6, nw_cap: int = 64):
        packed = pack_bsell(A, block, R=R, max_classes=max_classes,
                            nw_cap=nw_cap)
        if packed is None:
            return None
        arrays = []
        classes_meta = []
        for c in packed["classes"]:
            arrays.append((
                jnp.asarray(c["data"], dtype=dtype),
                jnp.asarray(c["enc"]),
                jnp.asarray(c["bases"]),
            ))
            classes_meta.append(tuple(sorted(
                (k, v) for k, v in c.items()
                if k not in ("data", "enc", "bases")
            )))
        meta = tuple(sorted(
            [(k, v) for k, v in packed.items() if k != "classes"]
            + [("classes", tuple(classes_meta))]
        ))
        return BlockSellMatrix(arrays=tuple(arrays), meta=meta)

    def spmv(self, x: jax.Array) -> jax.Array:
        if jax.default_backend() == "cpu":
            return self._spmv_xla(x)
        return bsell_spmv_pallas(self._m, x, self.arrays)

    def _spmv_xla(self, x: jax.Array) -> jax.Array:
        """Decode windows to block columns, gather via XLA (CPU path,
        bit-identical accumulation order to the kernel)."""
        m = self._m
        b, mb = m["b"], m["mb"]
        cdt = (jnp.float32 if self.dtype == jnp.bfloat16 else self.dtype)
        xc = x.astype(cdt).reshape(mb, b).T                # (b, mb)
        xp = jnp.pad(xc, ((0, 0), (0, m["S_pad"] * 128 - mb)))
        outs = []
        for spec, (data, enc, bases) in zip(m["classes"], self.arrays):
            K8, Gp, Gc = spec["K8"], spec["Gp"], spec["G"]
            nw = spec["nw"]
            off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
            hs = enc >> 7
            lo = enc & 127
            b_idx = jnp.repeat(jnp.arange(K8 // 8, dtype=jnp.int32), 8)
            g_idx = jnp.arange(Gp * 128, dtype=jnp.int32) // 128
            woff = jnp.asarray(off[:-1], dtype=jnp.int32)[b_idx]
            widx = jnp.clip(woff[:, None] + hs, 0, bases.shape[1] - 1)
            t = bases[g_idx[None, :], widx]
            cols = t * 128 + lo                            # block columns
            ys = []
            for rr in range(b):
                acc = jnp.zeros((Gp * 128,), cdt)
                for c in range(b):
                    d = data[(rr * b + c) * K8 : (rr * b + c + 1) * K8]
                    acc = acc + jnp.sum(d.astype(cdt) * xp[c][cols],
                                        axis=0)
                ys.append(acc[: Gc * 128])
            outs.append(jnp.stack(ys))                     # (b, Gc*128)
        out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        return out.T.reshape(-1)[: m["n"]].astype(x.dtype)

    def to_scipy(self) -> sp.csr_matrix:
        m = self._m
        b = m["b"]
        mats = []
        for spec, (data, enc, bases) in zip(m["classes"], self.arrays):
            K8, Gp, Gc = spec["K8"], spec["Gp"], spec["G"]
            nw = spec["nw"]
            off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
            e = np.asarray(enc)
            d = np.asarray(data, dtype=np.float64)         # (b*b*K8, N)
            hs = e >> 7
            lo = e & 127
            b_idx = np.repeat(np.arange(K8 // 8), 8)
            g_idx = np.arange(Gp * 128) // 128
            woff = off[:-1][b_idx]
            widx = np.clip(woff[:, None] + hs, 0, bases.shape[1] - 1)
            t = np.asarray(bases)[g_idx[None, :], widx]
            bcols = t * 128 + lo                           # (K8, N)
            brows = np.broadcast_to(np.arange(Gp * 128)[None, :], bcols.shape)
            rows_l, cols_l, vals_l = [], [], []
            for rr in range(b):
                for c in range(b):
                    pv = d[(rr * b + c) * K8 : (rr * b + c + 1) * K8]
                    rows_l.append(brows.ravel() * b + rr)
                    cols_l.append(bcols.ravel() * b + c)
                    vals_l.append(pv.ravel())
            M = sp.coo_matrix(
                (np.concatenate(vals_l),
                 (np.concatenate(rows_l), np.concatenate(cols_l))),
                shape=(Gp * 128 * b, m["S_pad"] * 128 * b),
            ).tocsr()[: Gc * 128 * b]
            mats.append(M)
        M = sp.vstack(mats).tocsr()[: m["n"], : m["m"]]
        M.eliminate_zeros()
        M.sum_duplicates()
        return sp.csr_matrix(M)
