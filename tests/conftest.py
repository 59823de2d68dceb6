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
# Use the environment's DEFAULT cache directory (~/.cache/jax_comp): this
# environment's jax resolves the cache root before conftest runs (jax is
# imported by sitecustomize at interpreter start), so a repo-local
# jax_compilation_cache_dir override is silently ignored for part of the
# process tree — round-4 verdict #5 measured exactly that (.jax_test_cache
# was never created over a 38-minute suite while entries landed in
# ~/.cache/jax_comp). Measured with the default dir: full-pipeline CPU
# compile 117s cold -> 51s cached. Lowering the write threshold below the
# default 1s catches the mid-sized per-stage jits too.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# jax may already have been imported by the environment's sitecustomize with a
# TPU backend registered; force the CPU backend for hermetic, parallel tests.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
