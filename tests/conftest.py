"""Test configuration: run the suite on a virtual 8-device CPU mesh so that
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored when a TPU plugin (e.g. 'axon') is
# installed; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import dynaboa_tpu  # noqa: E402

dynaboa_tpu.enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
