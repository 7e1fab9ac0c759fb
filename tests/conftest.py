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
# Use a test-only persistent cache dir: sharing the TPU-session cache can
# replay CPU AOT artifacts compiled with mismatched host-feature sets
# (XLA warns about possible SIGILL); an isolated dir only ever holds
# artifacts compiled by this same environment.
_test_cache = os.path.join(os.path.expanduser("~"), ".cache",
                           "nhans_tpu_jax_cpu_tests")
os.makedirs(_test_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _test_cache)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
