# Force an 8-device virtual CPU mesh BEFORE jax initializes, so sharding /
# collective tests run hermetically without TPUs (SURVEY.md §4 test strategy).
import os

# Force CPU even when the ambient environment preselects a TPU platform
# (JAX_PLATFORMS=axon): tests must be hermetic and deterministic.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The baked-in axon TPU plugin force-appends itself to jax_platforms at import
# time, ignoring JAX_PLATFORMS; config.update after import wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
