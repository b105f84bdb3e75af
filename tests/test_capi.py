"""C ABI binding test: build the shared library + a pure-C client with the
system toolchain and check it solves (the role of the reference's C/Fortran
binding smoke tests)."""

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("python3-config") is None,
    reason="needs g++ and python3-config",
)
def test_c_api_end_to_end(tmp_path):
    build = subprocess.run(
        ["sh", os.path.join(ROOT, "lib", "build.sh")],
        capture_output=True, text=True, timeout=180,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    env = dict(
        os.environ,
        PYTHONPATH=ROOT + ":" + ":".join(sys.path),
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
    )
    run = subprocess.run(
        [os.path.join(ROOT, "lib", "test_capi")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert run.returncode == 0, (run.stdout + run.stderr)[-2000:]
    assert "OK" in run.stdout
