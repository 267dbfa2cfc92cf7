"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on a virtual 8-device CPU platform (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Environment must be set before the first jax import.
"""

import os

# The harness presets JAX_PLATFORMS=axon and a sitecustomize.py imports jax
# at interpreter startup, so env vars set here are too late for the import-
# time snapshot. Set them anyway (XLA reads XLA_FLAGS at backend init,
# which is still lazy), then override the platform through jax.config
# before any computation runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_DIR)
