"""Test configuration: force an 8-device virtual CPU platform.

Tests never touch the real TPU — they exercise numerics on CPU and
multi-chip sharding on a fake 8-device mesh (the standard JAX
host-platform-device-count trick; the reference has no analog, see
SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site plugin force-sets jax_platforms="axon,cpu" (real-TPU tunnel) which
# overrides the env var; pin tests to the virtual CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
