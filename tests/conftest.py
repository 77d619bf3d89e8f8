"""Test configuration: run everything on CPU with 8 virtual devices.

Mirrors the reference's distributed-without-a-cluster strategy
(pita/tests/test_train.py:64-76 uses 2-process CPU DDP); here a single JAX
process with 8 virtual host devices exercises mesh/psum/all_gather logic.

Note: this environment pre-imports jax at interpreter start (sitecustomize)
with JAX_PLATFORMS=axon, so env vars are too late — use jax.config before the
backend initializes instead.
"""

import os

# keep both mechanisms: env for subprocesses, config for this process
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
