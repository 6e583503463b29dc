"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes.  Real-TPU behavior is exercised
by bench.py and the driver's graft entry, not by the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize registers itself and force-selects the
# axon platform via jax.config, overriding JAX_PLATFORMS; force CPU back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
