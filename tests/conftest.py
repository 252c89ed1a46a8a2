"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-chip without a cluster"
(SURVEY.md §4): sharding/collective tests run against
`--xla_force_host_platform_device_count=8` CPU devices, and the driver
separately dry-run-compiles the real multi-chip path.

The XLA flag must be set before jax initializes its backends; the platform
selection must be applied *after* importing jax because the session's axon
TPU plugin force-registers itself at import time and overwrites
`jax_platforms`.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _pin_prng_impl():
    """Pin the default PRNG per test: importing __graft_entry__ (or any TPU
    entry point) flips the GLOBAL default to rbg, which changes every
    PRNGKey stream and makes seed-sensitive training tests order-dependent."""
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    yield
