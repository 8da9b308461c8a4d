"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate numerics and the
multi-chip sharding path on host CPU with 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax with a hardware platform pinned
# (e.g. JAX_PLATFORMS=axon via sitecustomize); the env vars above are
# then too late, so override through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    import numpy as np
    return np.random.default_rng(0xC0B5)
