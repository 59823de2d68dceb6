"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/collective tests run anywhere (mirrors the driver's multichip dry-run
environment)."""

import os

# TPU_TESTS=1 keeps the real TPU backend so @pytest.mark.tpu tests (Mosaic
# compiled-mode regressions) can run: `TPU_TESTS=1 pytest -m tpu tests/`
_USE_TPU = os.environ.get("TPU_TESTS", "") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the e2e/CLI tests each compile the full
# 640x480 pipeline, which costs minutes per config on this 2-core host.
# With the cache the suite pays that only on its first-ever run (round-3
# verdict #7: default suite was 59:52). The env var (not just jax.config)
# matters so the CLI subprocess tests inherit it.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_test_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# jax may already have been imported by the environment's sitecustomize with a
# TPU backend registered; force the CPU backend for hermetic, parallel tests.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
FR1_XYZ = os.path.join(REFERENCE_ROOT, "rgbd_benchmark", "rgbd_dataset_freiburg1_xyz")
FR3_WALK = os.path.join(
    REFERENCE_ROOT, "rgbd_benchmark", "rgbd_dataset_freiburg3_walking_halfsphere"
)


@pytest.fixture(scope="session")
def fr1_xyz_path():
    if not os.path.isdir(FR1_XYZ):
        pytest.skip("fr1/xyz dataset not available")
    return FR1_XYZ


@pytest.fixture(scope="session")
def fr3_walking_path():
    if not os.path.isdir(FR3_WALK):
        pytest.skip("fr3/walking_halfsphere dataset not available")
    return FR3_WALK


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
