"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the standard JAX fake-backend pattern (SURVEY.md §4): all tests run on
CPU with 8 virtual devices so data/model-parallel code paths are exercised
without TPU hardware. Must run before jax initializes its backends.
"""
import os

# Force-override: the image presets JAX_PLATFORMS=axon (remote TPU tunnel)
# and its sitecustomize imports jax at interpreter start, so the env var alone
# is too late — jax.config.update below is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# Persistent compilation cache: reruns skip XLA compilation entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
