import numpy as np
import pytest

from lidar_snow_sim_tpu.sampling import (
    compute_occupancy,
    dart_throwing,
    dart_throwing_fast,
    gunn_marshall,
    rainfall_rate_to_snowfall_rate,
    sekhon_srivastava,
    snowfall_rate_to_rainfall_rate,
)
from lidar_snow_sim_tpu.sampling.banks import build_bank
from lidar_snow_sim_tpu.sampling.distributions import datagen_combos

PI = np.pi


def test_rate_conversions_roundtrip():
    for s, v in [(0.5, 2.0), (1.0, 1.6), (2.5, 0.6)]:
        rr = snowfall_rate_to_rainfall_rate(s, v)
        back = rainfall_rate_to_snowfall_rate(rr, v)
        assert np.isclose(back, s, rtol=1e-9)


def test_occupancy_formula():
    # occupancy = (1.0 * S) / (3.6e6 * 0.1 * v)  (sampling.py:23-32)
    assert np.isclose(compute_occupancy(2.5, 0.6), 2.5 / (3.6e6 * 0.06))


def test_size_distribution_parameters():
    assert np.isclose(sekhon_srivastava(4.0), 22.9 * 4.0**-0.45)
    assert np.isclose(gunn_marshall(4.0), 25.5 * 4.0**-0.48)


def test_datagen_combos_match_reference_grid():
    combos = datagen_combos()
    assert len(combos) == 5
    rr, occ = combos[0]  # snowfall 0.5 mm/h at 2 m/s
    assert np.isclose(occ, compute_occupancy(0.5, 2.0))
    assert np.isclose(rr, snowfall_rate_to_rainfall_rate(0.5, 2.0))


@pytest.mark.parametrize("sampler", [dart_throwing, dart_throwing_fast])
def test_dart_throwing_invariants(sampler):
    occupancy = 3e-7
    r0 = 80.0
    rng = np.random.default_rng(42)
    s = sampler(occupancy, 5.0, r0, rng, distribution="sekhon")

    assert s.shape[1] == 3
    assert len(s) > 0
    # inside domain, not covering origin
    d2 = s[:, 0] ** 2 + s[:, 1] ** 2
    assert np.all(d2 <= r0**2)
    assert np.all(d2 > s[:, 2] ** 2)
    # radii bounded by the 20mm max ball diameter
    assert np.all(s[:, 2] <= 0.010 + 1e-12)
    # pairwise non-overlap
    dx = s[:, None, 0] - s[None, :, 0]
    dy = s[:, None, 1] - s[None, :, 1]
    rr = s[:, None, 2] + s[None, :, 2]
    overlap = dx**2 + dy**2 <= rr**2
    np.fill_diagonal(overlap, False)
    assert not overlap.any()
    # area target reached, with stop-at-crossing semantics
    area = PI * np.sum(s[:, 2] ** 2)
    target = occupancy * PI * r0**2
    assert area >= target
    assert PI * np.sum(s[:-1, 2] ** 2) < target


def test_fast_sampler_matches_exact_statistics():
    """Same process statistics (area, count scale, radii distribution)."""
    occ, rate, r0 = 5e-7, 5.0, 80.0
    se = dart_throwing(occ, rate, r0, np.random.default_rng(1), "gunn")
    sf = dart_throwing_fast(occ, rate, r0, np.random.default_rng(2), "gunn")
    assert abs(len(se) - len(sf)) / max(len(se), len(sf)) < 0.35
    assert np.isclose(
        np.mean(se[:, 2] ** 2), np.mean(sf[:, 2] ** 2), rtol=0.35
    )


def test_bank_build_roundtrip():
    rng = np.random.default_rng(3)
    sets = [
        dart_throwing_fast(2e-7, 5.0, 80.0, rng, "gunn") for _ in range(4)
    ]
    bank = build_bank(sets, window_size=32, wide_capacity=16)
    assert bank.data.shape[0] == 4
    # narrow + wide counts must preserve every particle
    for c, s in enumerate(sets):
        assert bank.count[c] + bank.wide_count[c] == len(s)
        # extended angles ascending
        n_tot = bank.count[c] + 2 * bank.pad
        ang = bank.angle[c, :n_tot]
        assert np.all(np.diff(ang) >= 0)
        # core slice reproduces the particle set (as a set of rows)
        core = bank.data[c, bank.pad : bank.pad + bank.count[c], :3]
        wide = bank.wide[c, : bank.wide_count[c], :3]
        got = np.concatenate([core, wide])
        want = np.asarray(s, dtype=np.float32)
        got = got[np.lexsort(got.T)]
        want = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got, want, rtol=1e-6)
