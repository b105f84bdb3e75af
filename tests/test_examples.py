"""Smoke-run every example script (the reference ships its examples as
compiled CTest targets; these are the same guarantee for ours)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(ROOT, "examples"))
    if f.endswith(".py")
)


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=420,
    )
    assert out.returncode == 0, (script, out.stderr[-1500:])
    assert "iters" in out.stdout or "rel" in out.stdout, out.stdout[-500:]
