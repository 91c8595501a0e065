"""Test configuration: force a virtual 8-device CPU mesh so sharding tests and
Pallas interpret-mode kernels run without TPU hardware."""

import os

# Force the CPU backend even when the environment pre-selects a TPU platform
# (the image's sitecustomize sets JAX_PLATFORMS before we get a say).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
