"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's missing multi-node testing story with the TPU-native
answer (SURVEY.md §4): ``xla_force_host_platform_device_count`` simulates a
device mesh on CPU so sharding paths are exercised without hardware.

Note: this environment's sitecustomize force-selects the single-chip TPU
backend via ``jax.config.update("jax_platforms", ...)`` — an env var is not
enough; we must update the config again before any backend initializes.
Tests must run on CPU: the chip admits one process at a time, and test
precision assumes f32 (TPU matmuls default to bf16 accumulate).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
