"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the fake-backend mechanism for multi-device tests (the reference has
no test suite at all — SURVEY.md §4): XLA's host platform is forced to expose
8 CPU devices so Mesh/shard_map paths are exercised without TPU hardware.
Must run before jax initialises, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # harness presets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers a remote TPU backend and
# overrides JAX_PLATFORMS, so pin the platform through jax.config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2024)
