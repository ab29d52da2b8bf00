"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are exercised
on `--xla_force_host_platform_device_count=8` fake devices, mirroring the
driver's dryrun environment.  Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")

import jax  # noqa: E402

# The axon sitecustomize registers a TPU backend and pins jax_platforms at
# interpreter startup; tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

# Persistent compile cache: most of the 16-minute cold suite wall is XLA
# compiles; cached executables make warm reruns start hot.
from front_end_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (deselect with "
        "-m 'not slow')")
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (skipped on the "
        "virtual CPU mesh; the driver runs them on-chip)")


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) >= 8, f"expected 8 virtual CPU devices, got {d}"
    return d


@pytest.fixture
def rng():
    return np.random.default_rng(0)
