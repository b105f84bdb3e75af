"""Matrix I/O.

Capability parity with the reference's io layer:

* MatrixMarket read/write for sparse and dense, real and complex data
  (amgcl/io/mm.hpp:52,335-411) — delegated to scipy.io which implements
  the same format, with thin wrappers handling dense vectors and the
  reference's conventions;
* raw binary dump/load (amgcl/io/binary.hpp) — a fast np-based container
  holding CSR arrays, interoperable round-trip with the MatrixMarket
  path (the reference ships mm2bin/bin2mm converters; see
  amgcl_tpu.cli for ours).
"""

from __future__ import annotations

import struct

import numpy as np
import scipy.sparse as sp
import scipy.io as sio


# ----------------------------------------------------------------------
# MatrixMarket
# ----------------------------------------------------------------------

def mm_read(path):
    """Read a MatrixMarket file: returns scipy CSR for sparse files, or a
    dense ndarray for array files."""
    M = sio.mmread(path)
    if sp.issparse(M):
        M = sp.csr_matrix(M)
        M.sum_duplicates()
        return M
    M = np.asarray(M)
    if M.ndim == 2 and M.shape[1] == 1:
        return M[:, 0]
    return M


def mm_write(path, M, comment: str = ""):
    """Write a matrix/vector in MatrixMarket format.

    precision=17 (f64 round-trip exact): scipy's default 8 significant
    digits silently destroys solution accuracy — a written/reread x can
    lose two orders of magnitude of residual through truncation alone."""
    if sp.issparse(M):
        sio.mmwrite(path, M, comment=comment, precision=17)
    else:
        arr = np.asarray(M)
        if arr.ndim == 1:
            arr = arr[:, None]
        sio.mmwrite(path, arr, comment=comment, precision=17)


# ----------------------------------------------------------------------
# Binary format (capability of amgcl/io/binary.hpp: sizes + raw arrays)
# ----------------------------------------------------------------------

_MAGIC = b"AMGCLTPU"


def bin_write(path, M):
    """Raw binary dump of a CSR matrix or a dense vector/array."""
    with open(path, "wb") as f:
        f.write(_MAGIC)
        if sp.issparse(M):
            M = sp.csr_matrix(M)
            f.write(struct.pack("<cqq", b"s", M.shape[0], M.shape[1]))
            for arr, dt in (
                (M.indptr, np.int64),
                (M.indices, np.int64),
                (M.data, np.complex128 if np.iscomplexobj(M.data) else np.float64),
            ):
                a = np.asarray(arr, dtype=dt)
                f.write(struct.pack("<cq", b"c" if a.dtype.kind == "c" else
                                    (b"i" if a.dtype.kind == "i" else b"f"),
                                    a.size))
                f.write(a.tobytes())
        else:
            arr = np.asarray(M)
            dt = np.complex128 if np.iscomplexobj(arr) else np.float64
            a = np.ascontiguousarray(arr, dtype=dt)
            f.write(struct.pack("<cqq", b"d", a.shape[0],
                                a.shape[1] if a.ndim > 1 else 1))
            f.write(a.tobytes())


def bin_read(path):
    """Read a matrix/vector written by bin_write."""
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path}: not an amgcl_tpu binary file")
        kind, rows, cols = struct.unpack("<cqq", f.read(17))
        if kind == b"d":
            data = np.frombuffer(f.read(), dtype=np.float64)
            if cols == 1:
                return data[:rows].copy()
            return data[: rows * cols].reshape(rows, cols).copy()
        arrs = []
        for _ in range(3):
            k, size = struct.unpack("<cq", f.read(9))
            dt = {b"i": np.int64, b"f": np.float64, b"c": np.complex128}[k]
            arrs.append(
                np.frombuffer(f.read(size * np.dtype(dt).itemsize), dtype=dt)
            )
        indptr, indices, data = arrs
        return sp.csr_matrix((data, indices, indptr), shape=(rows, cols))
