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

# Tier split by module: `pytest -m fast` is the quick gate (~3 min on this
# 2-core host); everything else is marked slow (compile-dominated: full
# pipelines, Pallas kernels, separate-process workers). Keeping the split
# here avoids per-file marker boilerplate.
_FAST_MODULES = {
    "test_geometry",
    "test_linalg",
    "test_matching",
    "test_optim",
    "test_io",
    "test_native",
    "test_grad_safety",
    "test_kf_culling",
    "test_place_posegraph",
    "test_dist_ba",
    "test_orbvoc_convert",
    "test_map_scale",
    "test_fuse_dedupe",
}


def pytest_collection_modifyitems(config, items):
    markexpr = config.getoption("-m") or ""
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod == "test_soak":
            # Endurance tier: only runs when explicitly selected.
            if "soak" not in markexpr:
                item.add_marker(
                    pytest.mark.skip(reason="endurance tier: run with -m soak")
                )
            continue
        item.add_marker("fast" if mod in _FAST_MODULES else "slow")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
