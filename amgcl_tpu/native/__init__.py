"""ctypes loader for the native C++ setup kernels.

Builds lazily with g++ on first import (cached next to the source); all
callers fall back to pure-Python implementations when the toolchain is
unavailable, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kernels.cpp")
_SO = os.path.join(_HERE, "libamgcltpu.so")
_lock = threading.Lock()


class _Native:
    def __init__(self, dll):
        self._dll = dll
        dll.greedy_aggregate.restype = ctypes.c_int64
        dll.greedy_aggregate.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int64]
        dll.ilu0_factor.restype = ctypes.c_int64
        dll.ilu0_factor.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64]
        dll.level_schedule.restype = ctypes.c_int64
        dll.level_schedule.argtypes = [ctypes.c_void_p] * 3 + [
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        dll.ilut_factor.restype = ctypes.c_int64
        dll.ilut_factor.argtypes = (
            [ctypes.c_void_p] * 3
            + [ctypes.c_int64, ctypes.c_double, ctypes.c_double]
            + [ctypes.c_void_p] * 7
        )

    def greedy_aggregate(self, indptr, indices, strong, ids):
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        strong = np.ascontiguousarray(strong, dtype=np.uint8)
        assert ids.dtype == np.int64 and ids.flags.c_contiguous
        n = len(indptr) - 1
        return int(
            self._dll.greedy_aggregate(
                indptr.ctypes.data, indices.ctypes.data,
                strong.ctypes.data, ids.ctypes.data, n,
            )
        )

    def ilu0(self, indptr, indices, data):
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.ascontiguousarray(data, dtype=np.float64).copy()
        n = len(indptr) - 1
        rc = self._dll.ilu0_factor(
            indptr.ctypes.data, indices.ctypes.data, out.ctypes.data, n
        )
        if rc != 0:
            raise RuntimeError(f"ilu0: zero/missing pivot in row {-rc - 1}")
        return out

    def ilut(self, indptr, indices, data, p, tau):
        """Reference-exact ILUT(p, tau) (amgcl/relaxation/ilut.hpp:55).

        Returns (Lptr, Lcol, Lval, Uptr, Ucol, Uval, Dinv) with L/U the
        strict triangular factors and Dinv the inverted U diagonal.
        Raises on a zero pivot (no silent fallback)."""
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        data = np.ascontiguousarray(data, dtype=np.float64)
        n = len(indptr) - 1
        rows = np.repeat(np.arange(n), np.diff(indptr))
        lenL = np.bincount(rows, weights=(indices < rows), minlength=n)
        lenU = np.bincount(rows, weights=(indices > rows), minlength=n)
        Lcap = int((lenL * p).astype(np.int64).sum()) + 1
        Ucap = int((lenU * p).astype(np.int64).sum()) + 1
        Lptr = np.zeros(n + 1, np.int64)
        Uptr = np.zeros(n + 1, np.int64)
        Lcol = np.zeros(Lcap, np.int64)
        Ucol = np.zeros(Ucap, np.int64)
        Lval = np.zeros(Lcap, np.float64)
        Uval = np.zeros(Ucap, np.float64)
        Dinv = np.zeros(n, np.float64)
        rc = self._dll.ilut_factor(
            indptr.ctypes.data, indices.ctypes.data, data.ctypes.data,
            n, float(p), float(tau),
            Lptr.ctypes.data, Lcol.ctypes.data, Lval.ctypes.data,
            Uptr.ctypes.data, Ucol.ctypes.data, Uval.ctypes.data,
            Dinv.ctypes.data,
        )
        if rc != 0:
            raise RuntimeError(
                f"ilut: zero pivot in row {-rc - 1} "
                "(structural breakdown; no silent fallback)"
            )
        return Lptr, Lcol, Lval, Uptr, Ucol, Uval, Dinv

    def level_schedule(self, indptr, indices, n, lower):
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        levels = np.zeros(n, dtype=np.int64)
        nlev = self._dll.level_schedule(
            indptr.ctypes.data, indices.ctypes.data, levels.ctypes.data,
            n, 1 if lower else 0,
        )
        return levels, int(nlev)


def _build() -> str | None:
    with _lock:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(_SO + ".tmp", _SO)
            return _SO
        except Exception:
            return None


lib: _Native | None = None
_path = _build()
if _path is not None:
    try:
        lib = _Native(ctypes.CDLL(_path))
    except OSError:
        lib = None
