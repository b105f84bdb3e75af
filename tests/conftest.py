"""Test configuration.

Force the CPU backend with 8 virtual devices so (a) the suite doesn't
depend on TPU availability and (b) sharding/collective tests exercise real
multi-device code paths without hardware (the strategy SURVEY.md §4
prescribes: shard_map makes multi-chip testable in one process).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
