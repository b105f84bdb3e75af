"""Pallas TPU kernel for unstructured (arbitrary-pattern) SpMV.

XLA's gather on TPU executes at ~0.14 Gelem/s (measured honestly with
loop-carried inputs — benchmarks that let XLA hoist the gather report
10-20x higher fiction), which puts every unstructured matrix ~60x off
the HBM roofline.  Mosaic exposes exactly one fast gather: the
within-vreg `tpu.dynamic_gather` (take_along_axis on (8,128) tiles).
This kernel builds an arbitrary-pattern SpMV out of it:

* x lives in VMEM in full, shaped (S, 128) — subrow s holds
  x[128s : 128s+128];
* the ELL arrays are tiled into vregs of 8 slots x 128 rows; each vreg
  gets a static list of NW aligned 1024-element x windows covering all
  its column indices (bandwidth-reducing row order keeps NW small);
* per element the packed code stores (window index, subrow-in-window,
  lane): the kernel loads each window as an (8,128) table (dynamic
  sublane slice), broadcasts each of its 8 subrows and lane-gathers,
  select-accumulating by the packed window/subrow id — ~4 vector ops
  per (window, subrow) per vreg instead of a serialized XLA gather.

Reference role: the format-general accelerated SpMV of the reference's
GPU backends (amgcl/backend/cuda.hpp:61 cusparseSpMV) — redesigned for
a machine whose only gather primitive is vreg-local.
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


# ----------------------------------------------------------------------
# host-side packing
# ----------------------------------------------------------------------

def pack_sell(A: sp.csr_matrix, nw_cap: int = 24):
    """Pack a CSR matrix into the vreg-windowed SELL layout.

    Returns None when any vreg needs more than nw_cap windows (the
    caller should fall back to another format), else a dict of arrays:
      data (K8, n_pad) f64, enc (K8, n_pad) int32, bases (G, B, NW) i32,
      plus sizes.  enc = w*1024 + hi*128 + lo addresses window w's
      (8,128) table; padding slots point at window 0 with value 0.
    """
    A = sp.csr_matrix(A)
    A.sort_indices()
    n, m = A.shape
    counts = np.diff(A.indptr)
    K = max(int(counts.max()) if n else 1, 1)
    K8 = -(-K // 8) * 8
    G = -(-n // 128)
    n_pad = G * 128
    B = K8 // 8

    ell_c = np.zeros((n_pad, K8), dtype=np.int64)
    ell_d = np.zeros((n_pad, K8), dtype=np.float64)
    rows = np.repeat(np.arange(n), counts)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    ell_c[rows, offs] = A.indices
    ell_d[rows, offs] = A.data
    valid = np.zeros((n_pad, K8), dtype=bool)
    valid[rows, offs] = True

    # per-(band, group) window lists over aligned 1024-element blocks
    blk = np.where(valid, ell_c >> 10, -1)       # (n_pad, K8)
    blk4 = blk.reshape(G, 128, B, 8)
    enc = np.zeros((n_pad, K8), dtype=np.int32)
    bases = np.zeros((G, B, 1), dtype=np.int32)
    nw_max = 1
    base_list = [[None] * B for _ in range(G)]
    for g in range(G):
        for b in range(B):
            blocks = np.unique(blk4[g, :, b, :])
            blocks = blocks[blocks >= 0]
            if len(blocks) > nw_cap:
                return None
            if len(blocks) == 0:
                blocks = np.zeros(1, dtype=np.int64)
            nw_max = max(nw_max, len(blocks))
            base_list[g][b] = blocks
    NW = int(nw_max)
    # slot NW carries the per-vreg used-window count (SMEM block-shape
    # rules make a separate (G, B) array awkward)
    bases = np.zeros((G, B, NW + 1), dtype=np.int32)
    for g in range(G):
        for b in range(B):
            blocks = base_list[g][b]
            bases[g, b, NW] = len(blocks)
            bases[g, b, : len(blocks)] = blocks * 8     # sublane offsets
            bases[g, b, len(blocks): NW] = blocks[0] * 8 if len(blocks) \
                else 0
            # per-element encodings for this (g, b) chunk
            sl = slice(g * 128, (g + 1) * 128)
            cols_chunk = ell_c[sl, b * 8 : (b + 1) * 8]     # (128, 8)
            val_chunk = valid[sl, b * 8 : (b + 1) * 8]
            w = np.searchsorted(blocks, cols_chunk >> 10)
            w = np.clip(w, 0, len(blocks) - 1)
            hi = (cols_chunk >> 7) - (blocks[w] * 8)
            lo = cols_chunk & 127
            e = w * 1024 + hi * 128 + lo
            enc[sl, b * 8 : (b + 1) * 8] = np.where(val_chunk, e, 0)

    S_pad = max(-(-m // 128), int(bases.max()) // 1 + 8)
    S_pad = -(-S_pad // 8) * 8
    return dict(
        data=ell_d.T.copy(), enc=enc.T.copy(), bases=bases,
        n=n, m=m, n_pad=n_pad, K8=K8, B=B, G=G, NW=NW, S_pad=S_pad,
        nnz=int(A.nnz),
    )


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------

def _lane_gather(tbl, idx):
    """out[i,j] = tbl[i, idx[i,j]] via lax.gather in exactly the form the
    Mosaic lowering maps to tpu.dynamic_gather (jnp.take_along_axis would
    promote indices to int64 under jax_enable_x64 and fail to lower)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        tbl, idx[..., None], dn, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _sell_kernel(B, NW, data_ref, enc_ref, bases_ref, x_ref, y_ref):
    """One 128-row group: loop bands; per band loop only the windows it
    actually uses (dynamic bound from SMEM — the window-count
    distribution has mean ~3-4 but max ~20, so a static bound would do
    ~5x the work); each window = (8,128) table whose 8 subrows are
    broadcast + lane-gathered, select-accumulated by the packed (w, hi)
    ids."""
    # bf16 data streams at half width but gathers/accumulates in f32
    # (see pallas_sell2._sell2_kernel)
    cdt = (jnp.float32 if data_ref.dtype == jnp.bfloat16
           else data_ref.dtype)
    acc = jnp.zeros((1, 128), cdt)
    for b in range(B):
        d = data_ref[b * 8 : (b + 1) * 8, :]          # (8, 128)
        if d.dtype == jnp.bfloat16:
            d = d.astype(cdt)
        e = enc_ref[b * 8 : (b + 1) * 8, :]
        # hs = w*8 + hi: one compare per (window, subrow) instead of two
        hs = jax.lax.shift_right_logical(e, jnp.int32(7))
        lo = e & jnp.int32(127)

        def win_body(wi, gacc):
            t = bases_ref[0, b, wi]
            T8 = x_ref[pl.ds(t, 8), :]                # (8, 128)
            base = wi * jnp.int32(8)
            for s in range(8):
                Bv = jnp.broadcast_to(T8[s : s + 1, :], (8, 128))
                Gv = _lane_gather(Bv, lo)
                # additive masked accumulate (each element matches
                # exactly one (w, s)) — reassociable, unlike a serial
                # select chain
                gacc = gacc + jnp.where(hs == base + jnp.int32(s), Gv, 0.0)
            return gacc

        gacc = jax.lax.fori_loop(
            0, bases_ref[0, b, NW], win_body,
            jnp.zeros((8, 128), d.dtype),
        )
        acc = acc + jnp.sum(d * gacc, axis=0, keepdims=True)
    y_ref[...] = acc


def sell_spmv_pallas(packed, x: jax.Array, data: jax.Array,
                     enc: jax.Array, bases: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """y = A @ x for a packed SELL matrix (device arrays passed in)."""
    n, m = packed["n"], packed["m"]
    K8, B, G, NW, S_pad = (packed[k] for k in ("K8", "B", "G", "NW",
                                               "S_pad"))
    dt = data.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    xc = x.astype(cdt)
    x2 = jnp.pad(xc, (0, S_pad * 128 - m)).reshape(S_pad, 128)

    _i0 = lambda g: (jnp.int32(0), g)
    y = pl.pallas_call(
        partial(_sell_kernel, B, NW),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((K8, 128), _i0),
            pl.BlockSpec((K8, 128), _i0),
            pl.BlockSpec(
                (1, B, NW + 1),
                lambda g: (g, jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.MemorySpace.SMEM,
            ),
            pl.BlockSpec(
                (S_pad, 128), lambda g: (jnp.int32(0), jnp.int32(0))
            ),
            ],
        out_specs=pl.BlockSpec((1, 128), _i0),
        out_shape=jax.ShapeDtypeStruct((1, G * 128), cdt),
        interpret=interpret,
    )(data, enc, bases, x2)
    return y[0, :n].astype(x.dtype)


# ----------------------------------------------------------------------
# format wrapper
# ----------------------------------------------------------------------

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "enc", "bases"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class SellMatrix:
    """Vreg-windowed sliced-ELL matrix (see module docstring).  Scalar
    square-or-rectangular operators; selected for unstructured patterns
    on TPU backends when the window count stays small (bandwidth-
    reduced ordering)."""

    data: jax.Array       # (K8, n_pad)
    enc: jax.Array        # (K8, n_pad) int32
    bases: jax.Array      # (G, B, NW+1) int32; slot NW = used count
    meta: tuple           # hashable static dict proxy

    @property
    def _m(self):
        return dict(self.meta)

    @property
    def shape(self):
        m = self._m
        return (m["n"], m["m"])

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def block(self):
        return 1

    @property
    def nnz(self):
        return self._m["nnz"]

    @property
    def width(self):
        return self._m["K8"]

    @property
    def nbytes(self):
        return (self.data.size * self.data.dtype.itemsize
                + self.enc.size * 4 + self.bases.size * 4)

    def astype(self, dtype):
        return dataclasses.replace(self, data=self.data.astype(dtype))

    @staticmethod
    def from_scipy(A, dtype=jnp.float32, nw_cap: int = 24):
        packed = pack_sell(A, nw_cap=nw_cap)
        if packed is None:
            return None
        arrs = dict(packed)
        data = jnp.asarray(arrs.pop("data"), dtype=dtype)
        enc = jnp.asarray(arrs.pop("enc"))
        bases = jnp.asarray(arrs.pop("bases"))
        meta = tuple(sorted(arrs.items()))
        return SellMatrix(data=data, enc=enc, bases=bases, meta=meta)

    def spmv(self, x: jax.Array) -> jax.Array:
        m = self._m
        if jax.default_backend() == "cpu":
            return self._spmv_xla(x)
        return sell_spmv_pallas(m, x, self.data, self.enc, self.bases)

    def _spmv_xla(self, x: jax.Array) -> jax.Array:
        """Decode the packed windows back to flat columns and gather via
        XLA — the CPU/fallback path (bit-identical semantics)."""
        m = self._m
        B, NW, n = m["B"], m["NW"], m["n"]
        e = self.enc
        w = e >> 10
        hi = (e >> 7) & 7
        lo = e & 127
        K8, n_pad = e.shape
        G = m["G"]
        # block base per element: bases[g, b, w] (in subrows) -> *128
        b_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), 8)[:, None]
        g_idx = (jnp.arange(n_pad, dtype=jnp.int32) // 128)[None, :]
        base = self.bases[g_idx, b_idx, w]                  # (K8, n_pad)
        cols = base * 128 + hi * 128 + lo
        cdt = (jnp.float32 if self.dtype == jnp.bfloat16 else self.dtype)
        xc = x.astype(cdt)
        xp = jnp.pad(xc, (0, m["S_pad"] * 128 - m["m"]))
        y = jnp.sum(self.data.astype(cdt) * xp[cols], axis=0)
        return y[:n].astype(x.dtype)

    def to_scipy(self) -> sp.csr_matrix:
        mm = self._m
        e = np.asarray(self.enc)
        w = e >> 10
        hi = (e >> 7) & 7
        lo = e & 127
        K8, n_pad = e.shape
        B = mm["B"]
        b_idx = np.repeat(np.arange(B), 8)[:, None]
        g_idx = (np.arange(n_pad) // 128)[None, :]
        base = np.asarray(self.bases)[g_idx, b_idx, w]
        cols = base * 128 + hi * 128 + lo
        d = np.asarray(self.data)
        rows = np.broadcast_to(np.arange(n_pad)[None, :], d.shape)
        M = sp.coo_matrix(
            (d.ravel(), (rows.ravel(), cols.ravel())),
            shape=(n_pad, mm["S_pad"] * 128),
        ).tocsr()[: mm["n"], : mm["m"]]
        M.eliminate_zeros()
        M.sum_duplicates()
        return sp.csr_matrix(M)
