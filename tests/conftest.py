"""Test configuration: force a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the TPU-build equivalent of
the reference's world_size=1 distributed fallback, see SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
