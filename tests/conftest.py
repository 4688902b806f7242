"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so all sharding logic is CI-testable
without TPU hardware (SURVEY.md §4 rebuild test plan). Must set the env vars
before jax initialises its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin's sitecustomize force-selects its platform even over
# JAX_PLATFORMS; re-override before any backend initialises so the suite
# runs on the virtual 8-device CPU mesh deterministically.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
