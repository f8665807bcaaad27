# Tests run on a virtual 8-device CPU mesh so sharding/pjit paths are
# exercised without TPU hardware.
#
# Note: this container's sitecustomize registers the `axon` TPU plugin at
# interpreter start and pins jax to it, so setting JAX_PLATFORMS env alone
# is not enough — jax.config must be updated too (the CPU backend
# initializes lazily, so XLA_FLAGS set here still takes effect).
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
