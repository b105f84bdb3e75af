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
    # The env var alone is NOT enough to force CPU: backend plugins can
    # hook get_backend and initialize a remote device anyway (observed
    # with the axon TPU plugin — examples then silently ran over the
    # tunnel, or hung when it was congested).  Pin the jax *config*
    # before handing control to the script.
    path = os.path.join(ROOT, "examples", script)
    boot = (
        "import jax, runpy; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"runpy.run_path({path!r}, run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", boot],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=420,
    )
    assert out.returncode == 0, (script, out.stderr[-1500:])
    assert "iters" in out.stdout or "rel" in out.stdout, out.stdout[-500:]
