"""Test environment: CPU backend with 8 virtual devices.

The reference has no tests (SURVEY §4); this suite is designed from scratch.
The virtual-device trick is the TPU analog of a fake distributed backend:
sharding tests run the same pjit/shard_map code on an 8-device CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the tunneled TPU); the env var set
# above is overridden by the plugin, so force the platform via the config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
