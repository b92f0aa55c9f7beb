"""Test configuration: CPU backend with a virtual 8-device mesh, f64.

The axon TPU plugin registers itself in sitecustomize and wins over the
JAX_PLATFORMS env var, so the platform is forced via jax.config here (before
any computation runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR
