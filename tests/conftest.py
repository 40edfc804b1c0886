"""Test configuration: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's "test GPU code without a GPU" intent
(SURVEY.md §4): the same jitted functions run unchanged on TPU; CPU with
xla_force_host_platform_device_count=8 validates multi-chip sharding.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and clobbers
# JAX_PLATFORMS; the config route wins over both. Must happen before the
# first backend touch.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
