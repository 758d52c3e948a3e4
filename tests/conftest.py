"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are validated here exactly as the driver's
dryrun_multichip does — with xla_force_host_platform_device_count.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The session environment force-injects the 'axon' TPU platform even when
# JAX_PLATFORMS=cpu is exported; the config update below wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
