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

# Reference data mount when present; a generated cache otherwise, so the
# suite runs self-contained (dcora_tpu.datasets generators).
DATA_DIR = os.environ.get("DCORA_DATA_DIR", "/root/reference/data")


@pytest.fixture(scope="session")
def data_dir():
    if os.path.isdir(DATA_DIR):
        return DATA_DIR
    from dcora_tpu.datasets import ensure_test_datasets

    cache = os.path.join(os.path.dirname(__file__), os.pardir,
                         ".data_cache")
    return ensure_test_datasets(os.path.abspath(cache))


@pytest.fixture()
def require_dataset(data_dir):
    """Skip the test when a reference-only dataset file is unavailable."""

    def _check(name: str) -> str:
        p = os.path.join(data_dir, name)
        if not os.path.exists(p):
            pytest.skip(f"dataset {name} not available")
        return p

    return _check
