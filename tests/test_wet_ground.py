"""Wet-ground parity: device pipeline vs NumPy oracle + physics invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_snow_sim_tpu.config import WetGroundConfig
from lidar_snow_sim_tpu.models.wet_ground import WetGroundAugmenter, wet_ground_augment
from lidar_snow_sim_tpu.ops.fresnel import (
    fresnel_power,
    total_transmittance_from_ground,
)
from lidar_snow_sim_tpu.oracle.wet_ground import (
    fresnel_power as fresnel_power_oracle,
    ground_water_augmentation as oracle_aug,
)
from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

# Reference plane convention (planes.py:35-41): w = [a, b, -1]/|.|, h = raw
# z-intercept. For flat ground at z = -1.55: w = [0, 0, -1], h = -1.55.
PLANE = (np.array([0.0, 0.0, -1.0]), -1.55)


def test_fresnel_power_matches_oracle():
    ain = np.linspace(0.01, np.pi / 2 - 0.01, 500)
    got = [np.asarray(v) for v in fresnel_power(jnp.asarray(ain, jnp.float32))]
    want = fresnel_power_oracle(ain)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-5)


def test_fresnel_energy_conservation():
    """R + T <= 1 for a single interface at every incidence."""
    ain = jnp.linspace(0.0, jnp.pi / 2 - 0.01, 300)
    rs, ts, rp, tp, _ = fresnel_power(ain)
    assert np.all(np.asarray(rs + ts) <= 1.0 + 1e-5)
    assert np.all(np.asarray(rp + tp) <= 1.0 + 1e-5)


def test_total_transmittance_bounded():
    ain = jnp.linspace(0.01, jnp.pi / 2 - 0.02, 200)
    for rho in (0.05, 0.5, 1.0):
        _, ts, _, tp, _ = total_transmittance_from_ground(ain, rho=rho)
        assert np.all(np.asarray(ts) >= 0) and np.all(np.asarray(ts) <= 1.0 + 1e-5)
        assert np.all(np.asarray(tp) >= 0) and np.all(np.asarray(tp) <= 1.0 + 1e-5)


def test_wet_ground_parity_vs_oracle(scan):
    pc = scan
    want = oracle_aug(pc.astype(np.float64), plane=PLANE, device_semantics=True)

    aug = WetGroundAugmenter(max_points=1 << int(np.ceil(np.log2(len(pc)))))
    got = aug(pc, plane=PLANE)

    assert want.shape[0] > 0
    # same point count within f32 threshold-edge tolerance
    assert abs(len(got) - len(want)) / len(want) < 0.02

    # non-ground prefix identical (order preserved)
    n_ng_w = int((want[:, 4] == 0).sum())
    n_ng_g = int((got[:, 4] == 0).sum())
    assert abs(n_ng_w - n_ng_g) <= 2
    n_ng = min(n_ng_w, n_ng_g)
    np.testing.assert_allclose(got[:n_ng, :3], want[:n_ng, :3], rtol=1e-5)

    # ground intensities match within tolerance where both kept
    gw = want[n_ng_w:]
    gg = got[n_ng_g:]
    n_cmp = min(len(gw), len(gg))
    if n_cmp > 50:
        # compare sorted intensity distributions (row alignment may shift by
        # a few threshold-edge points)
        a = np.sort(gw[:, 3])[: n_cmp - 10]
        b = np.sort(gg[:, 3])[: n_cmp - 10]
        assert np.median(np.abs(a[: len(b)] - b[: len(a)])) < 2.0


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(estimation_method="poly"),
        dict(flat_earth=True),
        dict(water_height=0.0008, pavement_depth=0.001),  # viewer defaults
        dict(replace=False),
    ],
    ids=["poly", "flat_earth", "viewer_depths", "no_replace"],
)
def test_wet_ground_variants_match_oracle_counts(scan, kwargs):
    """Non-default estimator/geometry options track the oracle's point
    counts and intensity distribution."""
    from lidar_snow_sim_tpu.config import WetGroundConfig

    pc = scan
    want = oracle_aug(
        pc.astype(np.float64), plane=PLANE, device_semantics=True, **kwargs
    )
    aug = WetGroundAugmenter(
        cfg=WetGroundConfig(**kwargs),
        max_points=1 << int(np.ceil(np.log2(len(pc)))),
    )
    got = aug(pc, plane=PLANE)
    assert abs(len(got) - len(want)) / len(want) < 0.03
    gw = np.sort(want[want[:, 4] == 1.0][:, 3])
    gg = np.sort(got[got[:, 4] == 1.0][:, 3])
    n = min(len(gw), len(gg)) - 10
    if n > 50:
        assert np.median(np.abs(gw[:n] - gg[:n])) < 2.0


def test_bailout_below_1000_ground_points():
    rng = np.random.default_rng(0)
    pc = np.column_stack(
        [
            rng.uniform(5, 50, 500),
            rng.uniform(-5, 5, 500),
            rng.uniform(1, 3, 500),  # all well above ground
            rng.uniform(0, 255, 500),
            rng.integers(0, 64, 500),
        ]
    ).astype(np.float32)
    aug = WetGroundAugmenter(max_points=512)
    out = aug(pc, plane=PLANE)
    np.testing.assert_array_equal(out, pc)


def test_wet_ground_labels_and_monotonicity(scan):
    """Modified ground points carry label 1 and intensities never increase."""
    pc = scan
    cap = 1 << int(np.ceil(np.log2(len(pc))))
    padded = pad_cloud(pc, cap)
    res = jax.device_get(
        jax.jit(wet_ground_augment, static_argnames=("cfg",))(
            jnp.asarray(np.ascontiguousarray(padded.points.T)),
            jnp.asarray(padded.mask),
            jax.random.PRNGKey(0),
            WetGroundConfig(),
            plane=(jnp.asarray(PLANE[0], jnp.float32), jnp.float32(PLANE[1])),
        )
    )
    n = len(pc)
    is_g = res.is_ground[:n]
    assert not bool(res.bailed_out)
    assert is_g.sum() >= 1000
    kept_ground = is_g & res.keep[:n]
    assert np.all(np.asarray(res.planes)[4, :n][kept_ground] == 1.0)
    assert np.all(np.asarray(res.planes)[3, :n][kept_ground]
                  <= pc[kept_ground, 3] + 1e-4)
    assert int(res.num_modified) == int(kept_ground.sum())
