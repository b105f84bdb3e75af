"""Fortran binding consistency — this image ships no Fortran compiler
(libgfortran runtime only), so the iso_c_binding declarations are
validated structurally against the C library instead of compiled:

* every `bind(C, name=...)` symbol in fortran/amgcl_tpu.f90 must exist
  in lib/amgcl_tpu.h AND be exported by the built shared library;
* the Fortran-indexed entry points are exercised end-to-end through
  ctypes with 1-based arrays — bitwise the same call a Fortran program
  makes (iso_c_binding is the C ABI)."""

import ctypes
import os
import re
import subprocess

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
F90 = os.path.join(HERE, "fortran", "amgcl_tpu.f90")
HDR = os.path.join(HERE, "lib", "amgcl_tpu.h")
SO = os.path.join(HERE, "lib", "libamgcl_tpu_c.so")


def _f90_symbols():
    src = open(F90).read()
    return set(re.findall(r'bind\(C,\s*name="([^"]+)"\)', src))


def test_f90_names_match_header():
    syms = _f90_symbols()
    assert len(syms) >= 10
    hdr = open(HDR).read()
    for s in sorted(syms):
        assert re.search(rf"\b{s}\s*\(", hdr), f"{s} missing from header"


def test_f90_names_exported_by_library():
    if not os.path.exists(SO):
        rc = subprocess.run(["sh", os.path.join(HERE, "lib", "build.sh")],
                            capture_output=True)
        if rc.returncode != 0:
            pytest.skip("no toolchain to build the C library")
    out = subprocess.run(["nm", "-D", SO], capture_output=True, text=True)
    exported = set(re.findall(r" T (\w+)", out.stdout))
    for s in sorted(_f90_symbols()):
        assert s in exported, f"{s} not exported by {SO}"


def test_fortran_indexed_calls_through_abi():
    """Drive the *_f entry points exactly as Fortran would (1-based
    arrays, iso_c_binding = the plain C ABI) — in-process via capi."""
    from amgcl_tpu import capi

    n = 32
    ptr = np.zeros(n + 1, np.int64)
    col = np.zeros(3 * n, np.int64)
    val = np.zeros(3 * n, np.float64)
    nnz = 0
    for i in range(n):
        if i > 0:
            col[nnz] = i - 1
            val[nnz] = -1.0
            nnz += 1
        col[nnz] = i
        val[nnz] = 2.0
        nnz += 1
        if i < n - 1:
            col[nnz] = i + 1
            val[nnz] = -1.0
            nnz += 1
        ptr[i + 1] = nnz
    col = col[:nnz].copy()
    val = val[:nnz].copy()

    # 1-based, like Fortran
    ptr1 = ptr + 1
    col1 = col + 1

    prm = capi.params_create()
    capi.params_sets(prm, "solver.type", "cg")
    capi.params_setf(prm, "solver.tol", 1e-8)
    capi.params_sets(prm, "precond.class", "relaxation")

    h = capi.create_f(
        n, ptr1.ctypes.data, col1.ctypes.data, val.ctypes.data, prm
    )
    assert h > 0
    rhs = np.ones(n)
    x = np.zeros(n)
    iters, err = capi.solve(h, rhs.ctypes.data, x.ctypes.data, n)
    A = np.diag(np.full(n, 2.0)) - np.diag(np.ones(n - 1), 1) \
        - np.diag(np.ones(n - 1), -1)
    rel = np.linalg.norm(rhs - A @ x) / np.linalg.norm(rhs)
    assert rel < 1e-6
    capi.destroy(h)

    hp = capi.precond_create_f(
        n, ptr1.ctypes.data, col1.ctypes.data, val.ctypes.data, prm
    )
    assert hp > 0
    x[:] = 0.0
    capi.precond_apply(hp, rhs.ctypes.data, x.ctypes.data, n)
    assert np.linalg.norm(rhs - A @ x) < np.linalg.norm(rhs)
    assert isinstance(capi.precond_report(hp), str)
    capi.destroy(hp)
    capi.destroy(prm)
