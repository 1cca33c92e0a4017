"""Test configuration: force a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the TPU-build equivalent of
the reference's world_size=1 distributed fallback, see SURVEY.md §4).

NOTE: this image boots an `axon` TPU PJRT plugin from sitecustomize before
conftest runs, and it wins over the JAX_PLATFORMS env var — so we must also
override through jax.config after import. Without this, "CPU" tests silently
run on the single real TPU chip over a remote tunnel (slow, and contended
with benchmark runs)."""

import os

# Set before jax import for the CPU device-count flag to take effect.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
