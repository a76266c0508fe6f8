"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPUs are not needed for correctness tests — integer numerics are exact
on any backend, Pallas kernels run under interpret mode, and sharding tests
use xla_force_host_platform_device_count (SURVEY.md §4 strategy).
"""

import os

# The environment pre-registers a remote TPU backend (JAX_PLATFORMS=axon via
# sitecustomize) that overrides the env var; forcing the platform through
# jax.config is the reliable way to keep tests on the local CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)
