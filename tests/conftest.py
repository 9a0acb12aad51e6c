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


def pytest_configure(config):
    # pytest.ini's `addopts = -m "not slow"` keeps the default selection
    # fast, but it also applies to tests named EXPLICITLY by node id —
    # `pytest tests/test_x.py::TestY::test_z` on a slow test would print
    # "deselected" and exit 5 instead of running it.  Naming a test (or
    # class) is the clearest possible selection intent, so drop the
    # marker filter whenever a positional arg is a node id.
    if config.option.markexpr == "not slow" and \
            any("::" in str(a) for a in config.args):
        config.option.markexpr = ""


@pytest.fixture
def rng():
    return np.random.default_rng(0)
