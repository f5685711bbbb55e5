"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard JAX fake-backend pattern for exercising multi-chip
meshes without hardware (SURVEY.md §4d).

The container's sitecustomize registers (and initializes) the axon TPU
backend before any of our code runs, so setting JAX_PLATFORMS here is too
late — instead we flip the platform with jax.config.update, which works
post-init. XLA_FLAGS still takes effect because the CPU client is created
lazily on first CPU use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())} — the CPU "
    "client was created before XLA_FLAGS took effect")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE_DIR, "utils"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
