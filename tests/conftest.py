"""Test harness setup (SURVEY.md §4.3): force the CPU backend with 8 virtual
devices so all shard_map/all-to-all logic runs without TPU hardware.

Must run before any jax backend initialization; pytest imports conftest
first, and the axon sitecustomize only registers (doesn't initialize) the
TPU plugin, so `jax.config.update` here still wins.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
