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


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Release compiled executables after each test module. Every trainer
    instance re-jits its step closures, so a full-suite process accumulates
    hundreds of XLA:CPU LLVM-JIT'd programs; past ~200 modules' worth the
    CPU compiler segfaults mid-compilation (observed deterministically at
    the same late test, at only ~4 GB RSS on a 125 GB box — compiler/JIT
    state, not memory pressure). Per-module cache clearing keeps the live
    executable count bounded; cross-module recompiles of the shared
    module-level jits are the (measured, small) price."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
