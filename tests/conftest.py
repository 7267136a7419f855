"""Test configuration: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the reference had no
multi-device tests at all; see SURVEY.md §4)."""
import os

# NOTE: the environment exports JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize.py imports jax at interpreter start, so mutating os.environ
# here is too late — jax.config.update is the only reliable override. Without
# it the suite silently runs over the network with bf16 matmul defaults.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU, got " + jax.default_backend())
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(22742)
