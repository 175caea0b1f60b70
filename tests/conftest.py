"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Tests must run identically with or without TPU hardware; multi-chip sharding
is validated on a host-platform device mesh (the JAX analog of multi-node
simulation — see SURVEY.md §4).
"""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (real TPU); the
# test suite must be deterministic and multi-device, so override it.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize (/root/.axon_site) registers its TPU backend at
# interpreter start and programmatically overrides jax_platforms — the env
# var alone is not enough; force the config after import.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the slow suite is dominated by XLA CPU
# compiles of the big PWC train/inference programs (~85% of its hour);
# caching them makes RE-runs minutes instead (the VERDICT r3 #8 concern —
# round-end full runs discouraging re-runs). First/cold runs are unchanged.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
