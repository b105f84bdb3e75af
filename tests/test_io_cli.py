"""I/O round-trips, adapters, and the CLI (the role of the reference's
test_io.cpp plus examples/solver.cpp smoke usage)."""

import subprocess
import sys
import os

import numpy as np
import pytest
import scipy.sparse as sp

from amgcl_tpu.models.poisson import poisson2d, poisson3d
from amgcl_tpu.utils.io import mm_read, mm_write, bin_read, bin_write
from amgcl_tpu.adapter import (
    ReorderedProblem, ScaledProblem, complex_to_real, real_to_complex,
)


def test_mm_roundtrip(tmp_path):
    A, rhs = poisson2d(8)
    mm_write(tmp_path / "A.mtx", A)
    mm_write(tmp_path / "b.mtx", rhs)
    A2 = mm_read(tmp_path / "A.mtx")
    b2 = mm_read(tmp_path / "b.mtx")
    assert abs(A - A2).max() < 1e-14
    np.testing.assert_allclose(b2, rhs)


def test_bin_roundtrip(tmp_path):
    A, rhs = poisson2d(8)
    bin_write(tmp_path / "A.bin", A)
    bin_write(tmp_path / "b.bin", rhs)
    A2 = bin_read(tmp_path / "A.bin")
    b2 = bin_read(tmp_path / "b.bin")
    assert abs(A - A2).max() < 1e-14
    np.testing.assert_allclose(b2, rhs)


def test_bin_complex_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    A = sp.random(20, 20, density=0.2, random_state=rng, format="csr")
    A = A + 1j * sp.random(20, 20, density=0.2, random_state=rng, format="csr")
    bin_write(tmp_path / "C.bin", sp.csr_matrix(A))
    A2 = bin_read(tmp_path / "C.bin")
    assert abs(A - A2).max() < 1e-14


def test_reorder_adapter():
    A, rhs = poisson2d(10)
    rng = np.random.default_rng(1)
    perm = rng.permutation(A.shape[0])
    Ash = sp.csr_matrix(A[perm][:, perm])  # scrambled matrix
    ro = ReorderedProblem(Ash)
    # bandwidth must shrink back
    def bandwidth(M):
        C = M.tocoo()
        return int(np.abs(C.row - C.col).max())
    assert bandwidth(ro.A) <= bandwidth(Ash)
    v = rng.standard_normal(A.shape[0])
    np.testing.assert_allclose(ro.backward(ro.forward(v)), v)
    # solving the reordered system gives the original solution
    from amgcl_tpu import make_solver
    b = rng.standard_normal(A.shape[0])
    x_ref = sp.linalg.spsolve(Ash.tocsc(), b)
    S = make_solver(ro.A, solver="cg", tol=1e-10, maxiter=300)
    y, info = S(ro.forward(b))
    np.testing.assert_allclose(ro.backward(np.asarray(y)), x_ref, atol=1e-6)


def test_scaled_adapter():
    A, rhs = poisson2d(10)
    D = sp.diags(np.linspace(1, 100, A.shape[0]))
    A_bad = sp.csr_matrix(D @ A @ D)
    scp = ScaledProblem(A_bad)
    from amgcl_tpu import make_solver
    S = make_solver(scp.A, solver="cg", tol=1e-10, maxiter=300)
    y, _ = S(scp.scale_rhs(rhs))
    x = scp.unscale_solution(np.asarray(y))
    r = rhs - A_bad @ x
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6


def test_complex_adapter():
    rng = np.random.default_rng(2)
    A, _ = poisson2d(8)
    Ac = sp.csr_matrix(A + 0.1j * sp.eye(A.shape[0]))
    b = rng.standard_normal(A.shape[0]) + 1j * rng.standard_normal(A.shape[0])
    Ar, br = complex_to_real(Ac, b)
    x_ref = sp.linalg.spsolve(Ac.tocsc(), b)
    from amgcl_tpu import make_solver
    S = make_solver(Ar, solver="bicgstab", block=2, tol=1e-10, maxiter=300)
    y, _ = S(br)
    x = real_to_complex(np.asarray(y))
    np.testing.assert_allclose(x, x_ref, atol=1e-6)


def test_cli_end_to_end(tmp_path):
    A, rhs = poisson3d(10)
    mm_write(tmp_path / "A.mtx", A)
    mm_write(tmp_path / "b.mtx", rhs)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "amgcl_tpu.cli",
         "-A", str(tmp_path / "A.mtx"), "-f", str(tmp_path / "b.mtx"),
         "-o", str(tmp_path / "x.mtx"),
         "solver.type=cg", "solver.tol=1e-8",
         "precond.relax.type=spai0"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Iterations:" in out.stdout
    x = mm_read(tmp_path / "x.mtx")
    r = rhs - A @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6


def test_cli_convert(tmp_path):
    A, _ = poisson2d(6)
    mm_write(tmp_path / "A.mtx", A)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "amgcl_tpu.cli", "convert",
         str(tmp_path / "A.mtx"), str(tmp_path / "A.bin")],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    A2 = bin_read(tmp_path / "A.bin")
    assert abs(A - A2).max() < 1e-14


def test_cli_distributed(tmp_path):
    """--shards runs the distributed solve (mpi_solver.cpp role) and
    honours precond parameters from the config."""
    from amgcl_tpu.models.poisson import poisson3d

    A, rhs = poisson3d(12)
    mm_write(tmp_path / "A.mtx", A)
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4",
    )
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "amgcl_tpu.cli",
         "-A", str(tmp_path / "A.mtx"), "--shards", "4",
         "-o", str(tmp_path / "x.mtx"),
         "precond.coarse_enough=100", "solver.tol=1e-8"],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    x = mm_read(tmp_path / "x.mtx")
    r = rhs - A @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6

    # unknown distributed precond key must error, not be dropped
    bad = subprocess.run(
        [sys.executable, "-m", "amgcl_tpu.cli",
         "-A", str(tmp_path / "A.mtx"), "--shards", "4",
         "precond.bogus=1"],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert bad.returncode != 0


def test_config_schur_and_refine():
    """Runtime config classes: schur_pressure_correction and the refine
    solver through make_solver_from_config."""
    from amgcl_tpu.runtime import make_solver_from_config
    from amgcl_tpu.models.coupled import stokes2d
    from amgcl_tpu.models.poisson import poisson3d

    A, rhs, pmask = stokes2d(8)
    S = make_solver_from_config(A, {
        "solver": {"type": "fgmres", "tol": 1e-8, "maxiter": 300},
        "precond": {"class": "schur_pressure_correction", "pmask": pmask,
                    "approx_schur": False},
    })
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-6

    A2, rhs2 = poisson3d(12)
    S2 = make_solver_from_config(A2, {
        "solver": {"type": "refine", "tol": 1e-8, "inner": "cg",
                   "inner_tol": 1e-4},
    })
    x2, i2 = S2(rhs2)
    r2 = rhs2 - A2 @ np.asarray(x2, dtype=np.float64)
    assert np.linalg.norm(r2) / np.linalg.norm(rhs2) < 1e-7
