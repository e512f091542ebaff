"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md §4d).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS to the TPU plugin; the
# config flag below wins over it regardless of import order.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from lidar_snow_sim_tpu.calib import load_hdl64_calib  # noqa: E402
from lidar_snow_sim_tpu.sampling import dart_throwing_fast  # noqa: E402
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan  # noqa: E402


@pytest.fixture(scope="session")
def calib():
    return load_hdl64_calib()


@pytest.fixture(scope="session")
def scan(calib):
    return synthetic_scan(n_azimuth=220, seed=0, calib=calib)


@pytest.fixture(scope="session")
def small_particle_sets():
    """64 small per-channel particle sets (fast to sample, light occupancy)."""
    rng = np.random.default_rng(7)
    return [
        dart_throwing_fast(
            occupancy_ratio=2e-7,
            precipitation_rate=5.0,
            R_0=80.0,
            rng=rng,
            distribution="gunn",
        )
        for _ in range(64)
    ]
