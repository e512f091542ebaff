"""Capacity-margin stress tests over realistic density profiles (VERDICT r2
next-round item #9).

The bench scene is ONE point-density profile; real HDL-64 FOV crops are
raggeder. Each profile below runs the full dense pipeline at SHIPPED default
capacities against the HEAVIEST reference bank (2.5 mm/h gunn, ~18k
particles/channel): capacities may self-tune (growth is the contract, logged
and bounded) but the FINAL result must be overflow-free and produce sane
stats — the augmenter raises if any overflow survives growth.
"""

import dataclasses

import numpy as np
import pytest

from lidar_snow_sim_tpu.calib import load_hdl64_calib
from lidar_snow_sim_tpu.config import SnowfallConfig
from lidar_snow_sim_tpu.models.snowfall import SnowfallAugmenter
from lidar_snow_sim_tpu.sampling import (
    compute_occupancy,
    dart_throwing_fast,
    snowfall_rate_to_rainfall_rate,
)
from lidar_snow_sim_tpu.sampling.banks import build_bank
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan


@pytest.fixture(scope="module")
def heavy_bank():
    """The heaviest reference rate: 2.5 mm/h, v=1.6, gunn (~18k/channel)."""
    rate = snowfall_rate_to_rainfall_rate(2.5, 1.6)
    occ = compute_occupancy(2.5, 1.6)
    rng = np.random.default_rng(42)
    sets = [dart_throwing_fast(occ, rate, 80.0, rng, "gunn")
            for _ in range(64)]
    cfg = SnowfallConfig()
    return build_bank(
        sets, window_size=cfg.window_size,
        wide_threshold=cfg.wide_threshold, wide_capacity=cfg.wide_capacity,
    )


PROFILES = [
    # (name, n_azimuth, fov_deg, seed, n_boxes, channel_step); azimuth
    # counts sized so every scan fits one 32768 capacity (one compile)
    ("bench_like_dense_fov", 512, 87.0, 0, 12, 1),
    ("sparse_wide_fov", 380, 120.0, 1, 12, 1),
    ("narrow_dense_fov", 512, 50.0, 2, 12, 1),
    ("channel_dropout_half", 700, 87.0, 3, 12, 2),
    ("open_road_no_boxes", 512, 87.0, 4, 0, 1),
]


@pytest.mark.parametrize(
    "name,n_az,fov,seed,n_boxes,ch_step",
    PROFILES, ids=[p[0] for p in PROFILES],
)
def test_default_capacities_hold_or_heal(
    heavy_bank, name, n_az, fov, seed, n_boxes, ch_step
):
    calib = load_hdl64_calib()
    pc = synthetic_scan(
        n_azimuth=n_az, fov_deg=fov, seed=seed, calib=calib,
        n_boxes=n_boxes,
    )
    if ch_step > 1:  # channel dropout: e.g. only even lasers returned
        pc = pc[(pc[:, 4].astype(int) % ch_step) == 0]
    assert len(pc) <= 32768

    default = SnowfallConfig(max_points=32768, assembly="dense")
    aug = SnowfallAugmenter(bank=heavy_bank, calib=calib, cfg=default)
    # completes <=> every residual overflow is zero (the wrapper raises on
    # anything growth cannot heal)
    stats, out = aug(pc, shuffle=False)

    assert stats[0] > 0, f"{name}: no attenuation at 2.5 mm/h"
    assert 0 < len(out) <= len(pc)
    assert set(np.unique(out[:, 4])) <= {0.0, 1.0, 2.0}
    grown = {
        f.name: (getattr(default, f.name), getattr(aug.cfg, f.name))
        for f in dataclasses.fields(default)
        if getattr(default, f.name) != getattr(aug.cfg, f.name)
    }
    # growth is allowed but must stay bounded (a runaway doubling loop
    # would point at a mis-sized default or a broken counter)
    for key, (old, new) in grown.items():
        assert new <= max(old, 1) * 8, f"{name}: {key} grew {old} -> {new}"
    print(f"{name}: stats={stats}, grown={grown or 'none'}")
