"""Test configuration: force CPU backend with a simulated 8-device mesh.

Pallas kernels run in interpret mode off-TPU (see kernels/common.py), so
the full suite exercises kernel logic + sharding without TPU hardware.
The same code paths compile with Mosaic on a real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; force CPU
# (simulated 8-device mesh).  Set BS_TEST_TPU=1 to run the suite against the
# real chip instead (compiled Mosaic kernels, single device).
if not os.environ.get("BS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
