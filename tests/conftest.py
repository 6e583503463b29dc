"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes.  Real-TPU behavior is exercised
by the opt-in on-device lane (tests/test_tpu_parity.py, marker ``tpu``):

    NAUTILUS_TPU_TESTS=1 python -m pytest tests -m tpu -q

plus bench.py and the driver's graft entry.  Without NAUTILUS_TPU_TESTS
the whole suite is forced onto CPU and the tpu-marked tests self-skip.
"""

import os

_TPU_LANE = os.environ.get("NAUTILUS_TPU_TESTS") == "1"

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_LANE:
    # The axon TPU plugin's sitecustomize registers itself and force-selects
    # the axon platform via jax.config, overriding JAX_PLATFORMS; force CPU
    # back.
    jax.config.update("jax_platforms", "cpu")
    # No persistent compile cache for the CPU suite: XLA:CPU cache entries
    # embed AOT machine code, and deserializing a stale/foreign-host
    # artifact SIGSEGVs the whole run (the round-4/5 suite flake — crash
    # stack: compilation_cache.get_executable_and_time).  The suite is one
    # process, so jax's in-memory cache already dedups compiles within the
    # run; the persistent cache only saved cross-run compile time, which is
    # not worth a segfault class of flake.
    jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-device parity lane (needs NAUTILUS_TPU_TESTS=1 and a TPU)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
