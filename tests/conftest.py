"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; multi-device sharding
is validated on XLA's host-platform virtual devices. Must set flags before
jax initializes its backends.
"""

import os

# Force-override: the environment pins JAX_PLATFORMS=axon (the tunneled TPU),
# which is single-chip and slow to compile against; the unit suite runs on CPU.
# The axon sitecustomize re-sets jax_platforms via jax.config at interpreter
# start, so overriding the env var alone is not enough — override the config
# too, before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
