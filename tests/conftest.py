"""Test configuration: run everything on CPU with 8 virtual devices.

Mirrors the reference's distributed-without-a-cluster strategy
(pita/tests/test_train.py:64-76 uses 2-process CPU DDP); here a single JAX
process with 8 virtual host devices exercises mesh/psum/all_gather logic.
Must set flags before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
