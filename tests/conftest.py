"""Test configuration: force an 8-device virtual CPU platform.

Tests exercise multi-chip sharding logic without TPU hardware, per
SURVEY.md §4 — the TPU-world equivalent of "multi-node without a cluster".

NOTE: the axon TPU plugin prepends itself to ``jax_platforms`` regardless of
the env var, so we must override the config *after* importing jax (before
any backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache. NOTE: env vars don't work for this — the axon
# sitecustomize imports jax's config at interpreter startup, so
# JAX_COMPILATION_CACHE_DIR set here is read too late; config.update is
# authoritative (round-3 diagnosis; /tmp/jax_cache was empty rounds 1-2).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
