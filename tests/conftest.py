"""Test configuration: force a virtual 8-device CPU mesh so sharding tests and
Pallas interpret-mode kernels run without TPU hardware.

The image's sitecustomize imports jax at interpreter startup (registering a
TPU platform plugin), so environment variables are already frozen by the time
pytest runs — use the config API instead, which still works post-import as
long as no backend has been initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
