"""Test configuration: force an 8-device CPU platform before JAX initializes.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding code paths
compile and execute without TPU hardware. Benchmarks (bench.py) run on the
real chip instead.
"""

import os

# Must happen before jax initializes its backends. NOTE: the environment may
# export JAX_PLATFORMS=axon (a tunneled TPU); the jax.config.update below is
# what reliably forces CPU — the env var alone is not sufficient here.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: compile costs on this host are high (~0.5s
# per unique op); cache across test runs. Kept SEPARATE from bench.py's
# .jax_cache — a concurrent pytest (CPU) + bench (TPU) pair writing the
# same cache dir has produced a fatal abort inside jax's cache writer.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap in-process executable accumulation at one module's worth.

    With the whole suite in one process, XLA CPU's executable
    serialization (persistent-cache write) segfaults deterministically
    once a few hundred compiled programs have accumulated (observed at
    tests/test_keyframe_cmp.py on a cold cache; the same test is clean in
    isolation or after any shorter prefix). Dropping the in-memory jit
    cache between modules keeps the process below the trigger point;
    recompiles land on the persistent disk cache, so warm-run cost is
    deserialization only.
    """
    yield
    import jax
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
