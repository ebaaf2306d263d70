"""Test configuration: emulate an 8-device TPU slice on CPU (SURVEY.md §4 plan c).

Must run before the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon sitecustomize force-selects the TPU backend via
# jax.config at interpreter start; override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"

# Persistent compilation cache: the box has ONE core and the suite is
# compile-dominated (first full run ~25 min cold); cached reruns skip the
# XLA compiles entirely. Keyed on backend+flags, safe across branches.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
