"""Tests for the weather-baseline models: fog, STF fog, LISA, DROR.

These cover the consumed surface of the reference's submodules (SURVEY.md
§2.3): physical invariants, determinism, label conventions, and masking.
"""

import numpy as np
import pytest

from lidar_snow_sim_tpu.models.dror import (
    DROR_LEVELS,
    dror_snow_stats,
    dynamic_radius_outlier_filter,
    get_cube_mask,
    snow_level,
)
from lidar_snow_sim_tpu.models.fog import (
    FogAugmenter,
    FogParameterSet,
    soft_response_curve,
)
from lidar_snow_sim_tpu.models.lisa import LISA
from lidar_snow_sim_tpu.models.stf_fog import (
    BetaRandomization,
    StfFogAugmenter,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(3)
    n = 3000
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(3, 80, n)
    return np.column_stack(
        [
            r * np.cos(ang),
            r * np.sin(ang),
            rng.uniform(-1.8, 1.0, n),
            rng.uniform(20, 200, n),
            rng.integers(0, 64, n),
        ]
    ).astype(np.float32)


# ---------------- fog (ICCV'21 surface) ----------------


def test_fog_soft_curve_monotone_in_alpha():
    """Denser fog -> stronger soft-channel peak, nearer takeover."""
    peaks = []
    for alpha in (0.005, 0.02, 0.06):
        _, s = soft_response_curve(FogParameterSet(alpha=alpha))
        peaks.append(float(np.max(np.asarray(s))))
    assert peaks[0] < peaks[1] < peaks[2]


def test_fog_scatter_count_grows_with_alpha(cloud):
    counts = []
    for alpha in (0.005, 0.02, 0.06):
        _, stats = FogAugmenter(FogParameterSet(alpha=alpha))(cloud)
        counts.append(stats["num_scattered"])
    assert counts[0] < counts[1] < counts[2]


def test_fog_scattered_points_near_sensor(cloud):
    aug, _ = FogAugmenter(FogParameterSet(alpha=0.06))(cloud)
    fog_pts = aug[aug[:, 4] == 2]
    assert len(fog_pts) > 0
    r = np.linalg.norm(fog_pts[:, :3], axis=1)
    # fog clutter clusters at the soft-response peak (± jitter), near sensor
    assert float(r.max()) < 10.0


def test_fog_attenuates_kept_points(cloud):
    p = FogParameterSet(alpha=0.02)
    aug, _ = FogAugmenter(p)(cloud)
    kept = aug[aug[:, 4] == 0]
    assert len(kept) > 0
    assert float(kept[:, 3].max()) < float(cloud[:, 3].max())


def test_fog_noise_variants_follow_documented_laws():
    """The four range-noise variants' documented laws (PARITY.md /
    models/fog.py): v1 uniform +-amp, v2 gaussian sigma=amp, v3/v4 the same
    scaled by r_fog/MOR. With a constant-range ring the fog return range
    r_fog is one constant, so the displacement law is directly observable;
    with a shared seed v3/v4 must equal v1/v2 times exactly rel = r_fog/MOR.
    """
    from lidar_snow_sim_tpu.models.fog import (
        FogParameterSet,
        simulate_fog_pc,
        soft_response_curve,
    )

    n = 4000
    rng = np.random.default_rng(0)
    ang = rng.uniform(-1.0, 1.0, n)
    cloud = np.column_stack(
        [60 * np.cos(ang), 60 * np.sin(ang), np.zeros(n),
         np.full(n, 5.0), np.zeros(n)]
    ).astype(np.float32)

    base = FogParameterSet(alpha=0.06)
    _, soft = soft_response_curve(base)
    r_fog = float(np.argmax(np.asarray(soft)[:600])) / base.intervals_per_meter
    noise = 10.0
    amp = noise / base.intervals_per_meter
    rel = r_fog / base.mor

    devs = {}
    for v in ("v1", "v2", "v3", "v4"):
        p = FogParameterSet(alpha=0.06, noise=noise, noise_variant=v)
        _, fog_pts, info = simulate_fog_pc(p, cloud, noise=noise)
        assert info["num_scattered"] == n  # dim far ring: all fogged
        devs[v] = np.linalg.norm(fog_pts[:, :3], axis=1) - r_fog

    eps = 1e-3
    assert np.abs(devs["v1"]).max() <= amp + eps          # uniform, bounded
    assert np.abs(devs["v1"]).max() > 0.9 * amp           # ...and spread
    assert np.abs(devs["v2"]).max() > amp                 # gaussian tail
    assert np.abs(devs["v3"]).max() <= amp * rel + eps    # scaled uniform
    # same seed => identical underlying fields: v3/v4 are exactly rel * v1/v2
    # (away from the [0.3, range] clip)
    sel = np.abs(devs["v2"]) < (r_fog - 0.31) / 1.0
    np.testing.assert_allclose(
        devs["v3"], devs["v1"] * rel, atol=5e-3
    )
    np.testing.assert_allclose(
        devs["v4"][sel], devs["v2"][sel] * rel, atol=5e-3
    )


def test_simulate_fog_pc_reference_signature(cloud):
    """The submodule's simulate_fog(p, pc, noise) call shape
    (`pointcloud_viewer.py:2944`)."""
    from lidar_snow_sim_tpu.models.fog import simulate_fog_pc

    aug, fog_pts, info = simulate_fog_pc(
        FogParameterSet(alpha=0.06), cloud, noise=10.0
    )
    assert aug.shape[1] == 5
    assert len(fog_pts) == info["num_scattered"]
    assert (fog_pts[:, 4] == 2.0).all()


def test_simulate_fog_exact_viewer_contract(cloud):
    """The viewer's EXACT call pattern (`pointcloud_viewer.py:274-279,
    2944-2951`): mutable ParameterSet kwargs + post-hoc beta_0 assignment,
    simulate_fog(p, pc, noise, gain, noise_variant) -> (pc, fog_pc, info)
    with the three reference info keys."""
    from lidar_snow_sim_tpu.models.fog import ParameterSet, simulate_fog

    p = ParameterSet(
        gamma=0.000001, gamma_min=0.0000001, gamma_max=0.00001,
        gamma_scale=10000000,
    )
    p.beta_0 = p.gamma / np.pi
    p.alpha = 0.06

    aug, fog_pc, info = simulate_fog(p, cloud, 10, True, "v4")
    assert set(info) == {
        "min_fog_response", "max_fog_response", "num_fog_responses"
    }
    assert len(aug) == len(cloud)           # fog removes nothing
    assert info["num_fog_responses"] == len(fog_pc) > 0
    assert info["max_fog_response"] >= info["min_fog_response"] > 0
    # gain=True rescales the augmented cloud's intensity peak to 255
    assert abs(float(aug[:, 3].max()) - 255.0) < 1e-3
    # derived quantities follow the submodule's conventions
    assert abs(p.mor - np.log(20) / p.alpha) < 1e-9
    assert abs(p.beta - 0.046 / p.mor) < 1e-9


def test_fog_per_point_soft_channel_physics(cloud):
    """Radiometric consistency of the per-point competition: a LOW
    reflectivity target at long range must fog over before a HIGH one at
    the same range, and the fog range must sit before the target."""
    from lidar_snow_sim_tpu.models.fog import FogAugmenter

    pts = np.array(
        [
            [10.0, 0.0, 0.0, 5.0, 0],     # dim target -> fogged
            [10.0, 0.1, 0.0, 250.0, 0],   # bright target, same range -> kept
        ],
        np.float32,
    )
    # gamma = 1e-5 (the viewer slider's bright end) weakens the relative fog
    # response so the competition threshold falls between the two targets
    aug, stats = FogAugmenter(FogParameterSet(alpha=0.06, gamma=1e-5))(pts)
    assert aug[0, 4] == 2.0 and aug[1, 4] == 0.0
    assert np.linalg.norm(aug[0, :3]) < 10.0
    # survivor keeps geometry, attenuated two-way
    np.testing.assert_allclose(aug[1, :3], pts[1, :3], rtol=1e-6)
    expected = 250.0 * np.exp(-2 * 0.06 * np.linalg.norm(pts[1, :3]))
    np.testing.assert_allclose(aug[1, 3], expected, rtol=1e-4)
    # stronger gamma calibration -> strictly fewer fog replacements
    n_fog = []
    for gamma in (1e-7, 1e-6, 1e-5):
        a, s = FogAugmenter(FogParameterSet(alpha=0.03, gamma=gamma))(pts)
        n_fog.append(s["num_scattered"])
    assert n_fog[0] >= n_fog[1] >= n_fog[2]


# ---------------- STF fog ----------------


def test_beta_radomization_alias():
    """The reference's (misspelled) class name resolves."""
    from lidar_snow_sim_tpu.models.stf_fog import BetaRadomization

    assert BetaRadomization is BetaRandomization


def test_beta_randomization_seeded_and_positive():
    b1 = BetaRandomization(0.05, seed=5)
    b2 = BetaRandomization(0.05, seed=5)
    b3 = BetaRandomization(0.05, seed=6)
    az = np.linspace(0, 2 * np.pi, 100)
    v1, v2, v3 = (np.asarray(b.get_beta(az)) for b in (b1, b2, b3))
    np.testing.assert_allclose(v1, v2)
    assert not np.allclose(v1, v3)
    assert (v1 > 0).all()
    # field averages to ~beta
    assert abs(v1.mean() - 0.05) < 0.02


def test_stf_fog_exact_viewer_contract(cloud):
    """The viewer's exact call pattern (`pointcloud_viewer.py:2963-2970`):
    BetaRadomization(beta, seed=0) -> propagate_in_time(10) ->
    haze_point_cloud(pc, B, Namespace(...)) -> truncate columns."""
    from argparse import Namespace

    from lidar_snow_sim_tpu.models.stf_fog import (
        BetaRadomization,
        haze_point_cloud,
    )

    B = BetaRadomization(beta=0.06, seed=0)
    B.propagate_in_time(10)
    arguments = Namespace(
        sensor_type="Velodyne HDL-64E S3D", fraction_random=0.05
    )
    n_features = cloud.shape[1]
    pc = haze_point_cloud(cloud, B, arguments)
    pc = pc[:, :n_features]
    assert pc.shape[1] == n_features
    assert 0 < len(pc) <= len(cloud)
    assert set(np.unique(pc[:, 4])) <= {0.0, 2.0}
    # propagate_in_time moved the field but kept it positive / mean-correct
    az = np.linspace(0, 2 * np.pi, 64)
    beta_field = np.asarray(B.get_beta(az))
    assert (beta_field > 0).all()
    assert abs(beta_field.mean() - 0.06) < 0.02


def test_stf_fog_counts_and_labels(cloud):
    aug, stats = StfFogAugmenter(beta=0.05, seed=1)(cloud)
    assert (
        stats["num_scattered"] + stats["num_attenuated"] == len(aug)
    )
    assert stats["num_removed"] == len(cloud) - len(aug)
    assert set(np.unique(aug[:, 4])) <= {0.0, 2.0}
    # denser fog removes more
    _, stats_dense = StfFogAugmenter(beta=0.15, seed=1)(cloud)
    assert (
        stats_dense["num_removed"] + stats_dense["num_scattered"]
        > stats["num_removed"] + stats["num_scattered"]
    )


# ---------------- LISA ----------------


def test_lisa_alpha_increases_with_rain_rate():
    l = LISA(dsd_points=64)
    alphas = [l.alpha(rr) for rr in (1.0, 5.0, 25.0)]
    assert alphas[0] < alphas[1] < alphas[2]
    # published order of magnitude: ~1e-4..1e-2 1/m for 1..25 mm/h at 905 nm
    assert 1e-5 < alphas[0] < 1e-3
    assert 1e-4 < alphas[2] < 1e-1


def test_lisa_nd_marshall_palmer():
    l = LISA(dsd_points=64)
    d = np.array([0.5, 1.0, 2.0])
    nd = l.Nd(d, 10.0)
    assert (np.diff(nd) < 0).all()  # exponential decay in D
    np.testing.assert_allclose(
        nd, 8000.0 * np.exp(-4.1 * 10.0**-0.21 * d)
    )


def test_lisa_augment_reference_contract(cloud):
    """The viewer's exact consumption pattern (pointcloud_viewer.py:2901-2929):
    (N, 6) output, label 0 lost at origin / 1 attenuated / 2 scattered,
    intensity-diff column, deterministic under fixed_seed."""
    l = LISA(dsd_points=64)
    aug1 = l.augment(cloud, 10.0, fixed_seed=True)
    aug2 = l.augment(cloud, 10.0, fixed_seed=True)
    np.testing.assert_allclose(aug1, aug2)
    assert aug1.shape == (len(cloud), 6)
    assert set(np.unique(aug1[:, 4])) <= {0.0, 1.0, 2.0}
    lost = aug1[:, 4] == 0
    np.testing.assert_allclose(aug1[lost, :3], 0.0)   # moved to origin
    att = aug1[:, 4] == 1
    assert (aug1[att, 5] >= 0).all()                  # diff only on attenuated
    np.testing.assert_allclose(aug1[~att, 5], 0.0)
    # intensity scale preserved (input was 0..255)
    assert aug1[:, 3].max() > 1.5
    # viewer post-processing: filter label != 0
    kept = aug1[aug1[:, 4] != 0]
    comp, stats = l.augment_compact(cloud, 10.0, fixed_seed=True)
    assert len(comp) == len(kept)
    assert stats["num_lost"] == int(lost.sum())


def test_lisa_normalized_input_stays_normalized(cloud):
    l = LISA(dsd_points=64)
    norm = cloud.copy()
    norm[:, 3] /= 255.0
    aug = l.augment(norm, 10.0, fixed_seed=True)
    assert aug[:, 3].max() <= 1.0


def test_lisa_snow_modes():
    l_g = LISA(mode="gunn", dsd_points=64)
    l_s = LISA(mode="sekhon", dsd_points=64)
    d = np.array([0.5, 1.0])
    assert not np.allclose(l_g.Nd(d, 2.0), l_s.Nd(d, 2.0))
    # viewer pattern: alpha from a density curve over lisa.D
    curve = l_g.Nd(l_g.D, 2.0)
    assert abs(l_g.alpha(curve) - l_g.alpha(2.0)) < 1e-12


def test_lisa_heavier_rain_more_perturbation(cloud):
    l = LISA(dsd_points=64)
    _, light = l.augment_compact(cloud, 1.0, fixed_seed=True)
    _, heavy = l.augment_compact(cloud, 50.0, fixed_seed=True)
    assert (
        heavy["num_lost"] + heavy["num_scattered"]
        > light["num_lost"] + light["num_scattered"]
    )


def test_lisa_rate_sensitivity_strictly_increasing(cloud):
    """num_scattered must be STRICTLY increasing in Rr over 1..30 mm/h at a
    fixed seed (VERDICT r2 weak #1: the old clamped strongest-of-32 sample
    went rate-insensitive exactly where the model should discriminate)."""
    l = LISA(dsd_points=64)
    scattered = []
    for rr in (1.0, 3.0, 10.0, 30.0):
        _, stats = l.augment_compact(cloud, rr, fixed_seed=True)
        assert stats["droplet_overflow"] == 0
        scattered.append(stats["num_scattered"])
    assert scattered == sorted(scattered)
    assert len(set(scattered)) == len(scattered), scattered


def test_lisa_droplet_capacity_never_silently_clamped(cloud):
    """An undersized candidate set must be DETECTED by the residual power
    bound and auto-grown, not silently truncated (repo invariant)."""
    l = LISA(dsd_points=64, max_droplets=4, tail_droplets=2)
    _, stats = l.augment_compact(cloud, 30.0, fixed_seed=True)
    assert stats["droplet_overflow"] == 0       # post-heal result is clean
    assert l.max_droplets > 4                   # the clamp was caught
    # the healed result must agree with a generously-sized run on where the
    # capacity-independent outcomes land (same seed, same physics)
    big = LISA(dsd_points=64, max_droplets=l.max_droplets,
               tail_droplets=l.tail_droplets)
    kept_b, stats_b = big.augment_compact(cloud, 30.0, fixed_seed=True)
    assert stats_b == stats


def test_lisa_nearest_droplet_order_statistics():
    """The sampled nearest-droplet ranges must follow the exact Poisson
    order-statistic law: U=(r/d)^3 of the nearest droplet ~ Exp(lam)
    truncated to [0,1] (mean 1/lam for lam >> 1)."""
    import jax

    l = LISA(dsd_points=64)
    n = 4000
    d = 60.0
    pc = np.column_stack(
        [np.full(n, d), np.zeros(n), np.zeros(n), np.full(n, 100.0),
         np.zeros(n)]
    ).astype(np.float32)
    vol = (np.pi / 3.0) * (np.tan(l.beam_divergence / 2) * d) ** 2 * d
    lam = l.droplet_density(10.0) * vol
    assert lam > 5.0  # regime where the old clamp was always binding
    aug = l.augment(pc, 10.0, fixed_seed=True)
    scat = aug[aug[:, 4] == 2]
    # scattered ranges concentrate close to the sensor: the nearest-droplet
    # radial law gives E[r_1/d] ~ Gamma(4/3)/lam^(1/3)
    r_scat = np.linalg.norm(scat[:, :3], axis=1)
    import math

    expected = d * math.gamma(4 / 3) / lam ** (1 / 3)
    assert np.median(r_scat) < 2.5 * max(expected, l.r_min)


def test_lisa_fog_presets_match_shettle_fenn():
    """Fog DSD presets must reproduce the published Shettle & Fenn 1979
    totals: strong advection fog 20 cm^-3 (modal radius 10 um), moderate
    radiation fog 200 cm^-3 (modal radius 2 um)."""
    for preset, total_m3, modal_rad_um in (
        ("strong_advection", 20e6, 10.0),
        ("moderate_radiation", 200e6, 2.0),
    ):
        l = LISA(mode="fog", fog_preset=preset, dsd_points=256)
        np.testing.assert_allclose(
            l.droplet_density(1.0), total_m3, rtol=0.05
        )
        d_mode = l.D[np.argmax(l.Nd(l.D, 1.0))]
        np.testing.assert_allclose(500 * d_mode, modal_rad_um, rtol=0.1)


def test_lisa_dsd_constants_match_reference_sampling():
    """LISA's snow DSD rate parameters must equal the reference's
    sampling.py:72-87 fits (25.5 / 22.9 cm^-1 = 2.55 / 2.29 mm^-1), tying
    the two independent implementations to the same published constants."""
    from lidar_snow_sim_tpu.sampling.distributions import (
        gunn_marshall,
        sekhon_srivastava,
    )

    for rr in (1.0, 5.0, 25.0):
        lg = LISA(mode="gunn")
        d = np.array([1.0, 3.0])
        ratio = lg.Nd(d[1], rr) / lg.Nd(d[0], rr)
        lam_mm = -np.log(ratio) / (d[1] - d[0])
        np.testing.assert_allclose(lam_mm * 10, gunn_marshall(rr), rtol=1e-6)

        ls = LISA(mode="sekhon")
        ratio = ls.Nd(d[1], rr) / ls.Nd(d[0], rr)
        lam_mm = -np.log(ratio) / (d[1] - d[0])
        np.testing.assert_allclose(
            lam_mm * 10, sekhon_srivastava(rr), rtol=1e-6
        )


# ---------------- DROR ----------------


def test_dror_keeps_dense_removes_sparse():
    rng = np.random.default_rng(0)
    # a dense wall patch at 10 m (spacing ~2 cm << sr) + isolated floaters
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, 40), np.linspace(-1, 1, 40)),
        axis=-1,
    ).reshape(-1, 2)
    wall = np.column_stack(
        [np.full(len(grid), 10.0), grid[:, 0], grid[:, 1]]
    )
    floaters = rng.uniform(-40, 40, (50, 3)) + np.array([60, 0, 0])
    pc = np.vstack([wall, floaters]).astype(np.float32)
    keep = dynamic_radius_outlier_filter(pc)
    assert keep[: len(wall)].all()
    assert not keep[len(wall):].any()


def _dror_numpy_counts(pc, alpha=0.45, beta=3.0, sr_min=0.04):
    """f64 literal neighbour count (the DROR definition, Charron et al.)."""
    import math as _m

    xyz = pc[:, :3].astype(np.float64)
    r = np.linalg.norm(xyz, axis=1)
    sr = np.maximum(sr_min, beta * _m.radians(alpha) * r)
    sq = (xyz * xyz).sum(1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (xyz @ xyz.T), 0.0)
    return (d2 <= sr[:, None] ** 2).sum(1) - 1, np.sqrt(d2), sr


def _boundary_safe_cloud(seed, n=4000):
    """Random ring cloud whose pair distances all clear the radius boundary
    by >2e-3 m, so f32 cancellation noise cannot flip any pair (see
    models/dror.py docstring) and windowed == full == f64 exactly."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 80, n)
    z = rng.uniform(-2, 1, n)
    pc = np.column_stack(
        [r * np.cos(theta), r * np.sin(theta), z]
    ).astype(np.float32)
    # ~n²/2 pairs virtually guarantee some boundary-tied pair at any seed:
    # REPAIR the cloud by nudging offenders until every gap clears 2e-3
    for _ in range(50):
        counts, d, sr = _dror_numpy_counts(pc)
        gap = np.abs(d - sr[:, None])
        np.fill_diagonal(gap, 1.0)
        bad = np.unique(np.nonzero(gap < 2e-3)[0])
        if len(bad) == 0:
            break
        pc[bad, 2] += rng.uniform(0.004, 0.01, len(bad)).astype(np.float32)
    else:
        raise AssertionError("fixture repair did not converge")
    return pc, counts


def test_dror_windowed_matches_full_and_f64():
    """The azimuth-windowed kernel, the full-N kernel, and the f64 literal
    definition agree exactly on a boundary-safe cloud (incl. points within
    the seam reach of ±pi)."""
    pc, counts = _boundary_safe_cloud(seed=3)
    keep_np = counts >= 3
    keep_w = dynamic_radius_outlier_filter(pc)            # windowed path
    keep_f = dynamic_radius_outlier_filter(pc, window=0)  # full-N kernel
    assert (keep_w == keep_np).all()
    assert (keep_f == keep_np).all()


def test_dror_windowed_overflow_falls_back_exact():
    """A point whose radius reaches past its own horizontal range (ρ < sr)
    can neighbour any azimuth -> the windowed kernel must COUNT an overflow
    and the wrapper must fall back to the exact full-N kernel."""
    import math as _m

    import jax.numpy as jnp

    from lidar_snow_sim_tpu.models.dror import _jit_dror_windowed

    pc, counts = _boundary_safe_cloud(seed=3)
    pc = np.vstack([pc, np.array([[0.01, 0.0, 0.5]], np.float32)])
    cap = ((len(pc) + 255) // 256) * 256
    xyz = np.full((cap, 3), 1e6, np.float32)
    xyz[: len(pc)] = pc[:, :3]
    mask = np.zeros(cap, bool)
    mask[: len(pc)] = True
    _, ovf = _jit_dror_windowed(
        jnp.asarray(xyz), jnp.asarray(mask),
        jnp.float32(_m.radians(0.45)), jnp.float32(3.0), jnp.int32(3),
        jnp.float32(0.04), block=256, window=2048, margin=1024,
    )
    assert int(ovf) > 0
    keep = dynamic_radius_outlier_filter(pc)   # wrapper falls back
    keep_full = dynamic_radius_outlier_filter(pc, window=0)
    assert (keep == keep_full).all()


def test_dror_windowed_tiny_cloud_and_ragged_n():
    """n < block, n < margin, n not a block multiple all work."""
    pc, counts = _boundary_safe_cloud(seed=3)
    for m in (3, 57, 300, 1000):
        sub = pc[:m]
        keep_w = dynamic_radius_outlier_filter(sub)
        keep_f = dynamic_radius_outlier_filter(sub, window=0)
        assert (keep_w == keep_f).all(), m


def test_dror_radius_scales_with_range():
    """The same 12 cm spacing survives at far range, not at near range."""
    def line_at(dist, spacing, n=30):
        y = np.arange(n) * spacing
        return np.column_stack([np.full(n, dist), y, np.zeros(n)])

    near = line_at(2.0, 0.12).astype(np.float32)
    far = line_at(60.0, 0.12).astype(np.float32)
    # sr(2 m) = max(0.04, 3*0.0079*2) = 0.047 < 0.12 -> all removed
    assert not dynamic_radius_outlier_filter(near).any()
    # sr(60 m) = 1.41 > 0.12 -> all kept
    assert dynamic_radius_outlier_filter(far).all()


def test_dror_cube_and_levels():
    pc = np.array(
        [[5.0, 0.0, 0.0, 0, 0], [30.0, 0.0, 0.0, 0, 0], [5.0, -20.0, 0.0, 0, 0]],
        np.float32,
    )
    mask = get_cube_mask(pc)
    assert mask.tolist() == [True, False, False]
    assert snow_level(10) == "light"
    assert snow_level(DROR_LEVELS["medium"][0]) == "medium"
    assert snow_level(10**6) == "heavy"
    num, level = dror_snow_stats(pc)
    assert level == snow_level(num)


def test_dror_precomputed_fallback(tmp_path):
    """Pickle-fallback parity with `pointcloud_viewer.py:94-111,2612-2643`:
    mask = ones(before) with pickled indices cleared; severity read from the
    crop-variant pickle; missing file -> (-1, 'file not found')."""
    import pickle

    from lidar_snow_sim_tpu.models.dror import (
        precomputed_dror_mask,
        precomputed_snow_severity,
    )

    base = tmp_path / "alpha_0.45" / "all" / "hdl64" / "strongest"
    (base / "full").mkdir(parents=True)
    (base / "crop").mkdir(parents=True)
    with open(base / "full" / "frame_0001.pkl", "wb") as f:
        pickle.dump(np.array([0, 3, 7]), f)
    with open(base / "crop" / "frame_0001.pkl", "wb") as f:
        pickle.dump(np.arange(DROR_LEVELS["medium"][0]), f)

    mask = precomputed_dror_mask(
        tmp_path, "hdl64", "strongest", "full", 10, "frame_0001.bin"
    )
    assert mask.tolist() == [
        False, True, True, False, True, True, True, False, True, True
    ]
    num, level = precomputed_snow_severity(
        tmp_path, "hdl64", "strongest", "frame_0001.bin"
    )
    assert (num, level) == (DROR_LEVELS["medium"][0], "medium")
    assert precomputed_snow_severity(
        tmp_path, "hdl64", "strongest", "missing.bin"
    ) == (-1, "file not found")


def test_lisa_mxu_lookup_matches_xla_gather(cloud):
    """The Pallas one-hot-MXU Mie lookup (ops/lut_lookup.py, the TPU hot
    path) must agree with the XLA knot-pair gather within 1 ULP (FMA
    fusion difference only) and preserve every contract field."""
    l_x = LISA(dsd_points=64, mxu_lookup=False)
    l_m = LISA(dsd_points=64, mxu_lookup=True)   # interpreted kernel on CPU
    a_x = l_x.augment(cloud, 10.0, fixed_seed=True)
    a_m = l_m.augment(cloud, 10.0, fixed_seed=True)
    # labels may flip only where a 1-ULP qback difference crosses an exact
    # decision boundary — none observed on this cloud
    np.testing.assert_array_equal(a_x[:, 4], a_m[:, 4])
    np.testing.assert_allclose(a_m, a_x, rtol=1e-5, atol=1e-5)
