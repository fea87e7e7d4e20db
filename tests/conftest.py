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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (compile-heavy full-model/e2e)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test, excluded by default (VERDICT r4 #5: the "
        "full suite exceeded 10 min; the default lane must stay <5 min). "
        "Run everything with --runslow, or only the slow lane with "
        "-m slow --runslow.")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return  # explicit selection — don't second-guess it
    skip = pytest.mark.skip(reason="slow; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
