"""Test configuration: run everything on a virtual 8-device CPU mesh so
pjit/sharding code is exercised without TPU hardware (the standard JAX
recipe for testing multi-device code).

Note: the env in this image pins JAX_PLATFORMS=axon (the TPU tunnel) and
the plugin wins over the env var, so we must force CPU through
jax.config.update before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache (enabled by nhans_tpu for the TPU
# tunnel) can replay CPU AOT artifacts with mismatched host features;
# disable it for the CPU test environment.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
