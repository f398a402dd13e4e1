"""Test configuration: CPU-only, 8 virtual devices, float64.

Tests run on a simulated 8-device CPU mesh (the driver validates real
multi-chip sharding separately via __graft_entry__.dryrun_multichip) and in
float64 so trajectories can be matched against the reference's stored numpy
traces (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env selects the TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's TPU plugin (axon sitecustomize) may already have imported
# jax and force-set jax_platforms; override via config, which wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
