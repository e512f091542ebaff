"""End-to-end snowfall parity: jitted TPU pipeline vs the NumPy oracle.

Plane and channel->bank order are injected into both sides so the comparison
isolates the occlusion + pulse-resimulation semantics (the unseeded pieces are
pinned per SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_snow_sim_tpu.config import SnowfallConfig
from lidar_snow_sim_tpu.calib import load_hdl64_calib
from lidar_snow_sim_tpu.models.snowfall import (
    calib_device_arrays,
    snowfall_augment,
)
from lidar_snow_sim_tpu.oracle.snowfall import augment as augment_oracle
from lidar_snow_sim_tpu.sampling.banks import build_bank
from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

BEAM_DIV_DEG = float(np.degrees(3e-3))
# Reference plane convention (planes.py:35-41): w = [a, b, -1]/|.|, h = raw
# z-intercept of z = a x + b y + c.
_W = np.array([0.005, -0.003, -1.0])
PLANE = (_W / np.linalg.norm(_W), -1.55)


@pytest.fixture(scope="module")
def setup(request):
    calib = load_hdl64_calib()
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    pc = synthetic_scan(n_azimuth=100, seed=1, calib=calib)
    # pre-sort by channel so the device's stable sort is the identity and
    # rows align 1:1 with the oracle
    pc = pc[np.argsort(pc[:, 4], kind="stable")]

    rng = np.random.default_rng(11)
    sets = []
    for _ in range(64):
        ang = rng.uniform(0, 2 * np.pi, 250)
        d = np.sqrt(rng.uniform(0.01, 1, 250)) * 60
        r = rng.uniform(0.005, 0.05, 250)
        sets.append(np.column_stack([d * np.cos(ang), d * np.sin(ang), r]))

    cfg = SnowfallConfig(
        max_points=1 << int(np.ceil(np.log2(len(pc)))),
        window_size=256,
        wide_capacity=64,
        max_occluders=48,
        max_bumps=24,
        point_chunk=256,
    )
    bank = build_bank(
        sets,
        window_size=cfg.window_size,
        wide_threshold=cfg.wide_threshold,
        wide_capacity=cfg.wide_capacity,
    )
    order = np.random.default_rng(3).permutation(64)
    return calib, pc, sets, bank, order, cfg


def test_full_pipeline_parity(setup):
    calib, pc, sets, bank, order, cfg = setup

    stats_o, aug_o_full = augment_oracle(
        pc.astype(np.float64),
        sets,
        calib,
        order,
        BEAM_DIV_DEG,
        plane=PLANE,
        device_semantics=True,
    )

    padded = pad_cloud(pc, cfg.max_points)
    res = jax.jit(snowfall_augment, static_argnames=("cfg",))(
        jnp.asarray(padded.points),
        jnp.asarray(padded.mask),
        jax.device_put(bank),
        calib_device_arrays(calib),
        jnp.asarray(order, jnp.int32),
        jax.random.PRNGKey(0),
        cfg,
        plane=(jnp.asarray(PLANE[0], jnp.float32), jnp.float32(PLANE[1])),
    )
    res = jax.device_get(res)

    assert res.window_overflow == 0
    assert res.occluder_overflow == 0
    assert res.bump_overflow == 0

    n = len(pc)
    got = np.asarray(res.planes).T[:n]
    keep = res.keep[:n]

    # --- per-point parity BEFORE the keep filter ---------------------------
    # run the oracle again without the noise filter by reconstructing its
    # pre-filter cloud: oracle returns the filtered cloud, so instead compare
    # the jax points against an oracle re-run at the channel level
    from lidar_snow_sim_tpu.oracle.snowfall import (
        occlusion_dicts,
        resimulate_channel,
    )
    from lidar_snow_sim_tpu.oracle.snowfall import _wrap_02pi

    from lidar_snow_sim_tpu.oracle.snowfall import (
        hit_set_margins,
        pulse_decision_margins,
    )

    # Any device/oracle disagreement must sit ON a decision boundary where
    # f32 and f64 legitimately tie-break differently (simulation.py:151-192
    # decision structure); anything else is a bug and fails hard. On the CPU
    # backend the pipeline is currently EXACT (zero mismatches) — the margin
    # machinery guards the TPU/f32 case and future scenes.
    _EPS = dict(
        peak_tie=1e-4,      # argmax near-tie between waveform bins
        range_margin=1e-3,  # |d_max - d_orig| vs the 0.2 m label cut [m]
        int_margin=1e-3,    # int() truncation edge [intensity counts]
        bin_margin=1e-4,    # ceil/floor pulse-bin edge [bin fractions]
        min_ratio=1e-5,     # an occluder claiming ~zero angular width
        cull=1e-3,          # particle range vs target range [m]
        tangency=1e-5,      # edge-line distance vs particle radius [m]
        angle=1e-6,         # particle azimuth vs beam limit [rad]
    )
    mismatches = []
    unexplained = []
    total = 0
    beam_rad = np.radians(BEAM_DIV_DEG)
    for channel in range(64):
        m = pc[:, 4] == channel
        if not m.any():
            continue
        cpc = pc[m].astype(np.float64)
        d = np.linalg.norm(cpc[:, :3], axis=1)
        center = _wrap_02pi(np.arctan2(cpc[:, 1], cpc[:, 0]))
        beams = np.column_stack(
            [_wrap_02pi(center - beam_rad / 2), _wrap_02pi(center + beam_rad / 2)]
        )
        occl = occlusion_dicts(beams, d, sets[order[channel]], BEAM_DIV_DEG)
        _, want = resimulate_channel(
            cpc, occl, channel,
            float(calib.min_intensity[channel]),
            float(calib.focal_distance[channel]),
            float(calib.focal_slope[channel]),
        )
        have = got[m]
        total += len(want)
        bad = np.where(
            (have[:, 4] != want[:, 4])
            | (np.abs(have[:, 3] - np.round(want[:, 3])) > 1)
            | (np.abs(have[:, :3] - want[:, :3]).max(axis=1) > 0.05)
        )[0]
        for j in bad:
            margins = pulse_decision_margins(
                d[j], cpc[j, 3], occl[j], channel,
                float(calib.min_intensity[channel]),
                float(calib.focal_distance[channel]),
                float(calib.focal_slope[channel]),
            )
            margins.update(
                hit_set_margins(
                    cpc[j, :3], d[j], beams[j, 0], beams[j, 1],
                    sets[order[channel]],
                )
            )
            on_boundary = any(
                margins[k] < eps for k, eps in _EPS.items()
            )
            rec = (channel, int(j), int(want[j, 4]), int(have[j, 4]), margins)
            mismatches.append(rec)
            if not on_boundary:
                unexplained.append(rec)

    assert total == n
    assert not unexplained, (
        f"{len(unexplained)} device/oracle mismatches NOT on any decision "
        f"boundary: {unexplained[:5]}"
    )
    # boundary ties must stay rare even where they are legitimate
    assert len(mismatches) / total < 0.002, (
        f"{len(mismatches)}/{total} boundary-tied mismatches"
    )

    # --- statistics parity: exact on the CPU backend ------------------------
    na_o, nr_o, ad_o = stats_o
    assert (int(res.num_attenuated), int(res.num_removed)) == (na_o, nr_o)
    assert int(res.avg_intensity_diff) == ad_o

    # --- compacted cloud ----------------------------------------------------
    aug_jax = got[keep]
    assert len(aug_jax) == len(aug_o_full)
    labels = aug_jax[:, 4]
    assert set(np.unique(labels)).issubset({0.0, 1.0, 2.0})


def test_no_particles_is_identity(setup):
    """With empty particle sets every point is label 0 and only the noise
    floor filter applies."""
    calib, pc, _, _, order, cfg = setup
    sets = [np.zeros((0, 3))] * 64
    bank = build_bank(
        sets, window_size=cfg.window_size, wide_capacity=cfg.wide_capacity
    )
    padded = pad_cloud(pc, cfg.max_points)
    res = jax.jit(snowfall_augment, static_argnames=("cfg",))(
        jnp.asarray(padded.points),
        jnp.asarray(padded.mask),
        jax.device_put(bank),
        calib_device_arrays(calib),
        jnp.asarray(order, jnp.int32),
        jax.random.PRNGKey(0),
        cfg,
        plane=(jnp.asarray(PLANE[0], jnp.float32), jnp.float32(PLANE[1])),
    )
    res = jax.device_get(res)
    n = len(pc)
    assert res.num_attenuated == 0
    np.testing.assert_array_equal(res.planes[4, :n], 0.0)
    # untouched points keep their coordinates and intensities
    np.testing.assert_allclose(np.asarray(res.planes)[:3, :n].T, pc[:, :3], rtol=1e-6)
    np.testing.assert_allclose(res.planes[3, :n], pc[:, 3], atol=0.5)
