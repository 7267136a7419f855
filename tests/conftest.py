"""Test configuration: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the reference had no
multi-device tests at all; see SURVEY.md §4)."""
import os

# NOTE: must overwrite, not setdefault — the environment may export
# JAX_PLATFORMS=axon (remote TPU tunnel), which would silently run the test
# suite over the network with bf16 matmul defaults.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(22742)
