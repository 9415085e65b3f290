"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count=8` (SURVEY.md §4 implication). These
env vars must be set before jax initializes, hence module scope here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The hosted TPU plugin force-registers itself ahead of the JAX_PLATFORMS env
# var, so pin the platform through the config API instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
