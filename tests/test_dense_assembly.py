"""Dense-slice assembly must reproduce the window assembly bit-for-bit.

The dense path (snowfall_augment_dense) tests each beam against a superset of
the window path's candidates with the same exact intersection predicate, so
with zero overflows the outputs are identical. The test's input is pre-sorted
by channel (stable) so the window path's channel-sorted output rows align with
the dense path's original-order output rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_snow_sim_tpu.calib import load_hdl64_calib
from lidar_snow_sim_tpu.config import SnowfallConfig
from lidar_snow_sim_tpu.models.snowfall import (
    calib_device_arrays,
    snowfall_augment,
)
from lidar_snow_sim_tpu.sampling.banks import build_bank
from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

_W = np.array([0.005, -0.003, -1.0])
PLANE = (_W / np.linalg.norm(_W), -1.55)


@pytest.fixture(scope="module")
def setup():
    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=100, seed=2, calib=calib)
    pc = pc[np.argsort(pc[:, 4], kind="stable")]
    rng = np.random.default_rng(5)
    sets = []
    for _ in range(64):
        ang = rng.uniform(0, 2 * np.pi, 300)
        d = np.sqrt(rng.uniform(0.01, 1, 300)) * 60
        r = rng.uniform(0.005, 0.05, 300)
        sets.append(np.column_stack([d * np.cos(ang), d * np.sin(ang), r]))
    bank = build_bank(sets, window_size=256, wide_capacity=64)
    order = np.random.default_rng(3).permutation(64)
    return calib, pc, bank, order


def _run(setup, cfg):
    calib, pc, bank, order = setup
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
    return jax.device_get(res)


def test_dense_matches_window(setup):
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, point_chunk=256,
    )
    rw = _run(setup, SnowfallConfig(**base, assembly="window"))
    rd = _run(
        setup,
        SnowfallConfig(
            **base, assembly="dense", channel_capacity=128,
            block_points=32, slice_width=256, chunk_group=8,
        ),
    )
    for r in (rw, rd):
        assert r.window_overflow == 0
        assert r.occluder_overflow == 0
        assert r.bump_overflow == 0
        assert r.channel_overflow == 0
        assert r.compact_overflow == 0
    n = len(setup[1])
    np.testing.assert_array_equal(rw.planes[:, :n], rd.planes[:, :n])
    np.testing.assert_array_equal(rw.keep[:n], rd.keep[:n])
    assert int(rw.num_attenuated) == int(rd.num_attenuated)
    assert int(rw.num_removed) == int(rd.num_removed)
    assert int(rw.avg_intensity_diff) == int(rd.avg_intensity_diff)


def test_dense_channel_overflow_detected(setup):
    """channel_capacity smaller than the densest channel must be counted."""
    cfg = SnowfallConfig(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, assembly="dense",
        channel_capacity=32, block_points=32, slice_width=256, chunk_group=8,
    )
    res = _run(setup, cfg)
    assert int(res.channel_overflow) > 0


@pytest.mark.parametrize(
    "band,transposed,route", [
        (0, False, 0), (256, False, 0), (0, True, 0), (0, False, 256),
        (0, False, 128),
        # non-128-multiple band: the band anchors' upper clamp must floor
        # to a 128-multiple so the in-VMEM views stay aligned
        (0, False, 96),
    ]
)
def test_pallas_phase_matches_window(setup, band, transposed, route):
    """The fused Pallas phase-A kernel (interpret mode on CPU) must keep the
    dense path bit-identical to the window path — the full-slice (band=0),
    the banded per-group variant, the transposed (points-on-lanes)
    layout, and the span-ROUTED kernel (route_band > 0; route=128 forces a
    mix of fast-banded and full-slice chunks through BOTH gated bodies)."""
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, point_chunk=256,
    )
    rw = _run(setup, SnowfallConfig(**base, assembly="window"))
    rp = _run(
        setup,
        SnowfallConfig(
            **base, assembly="dense", channel_capacity=128,
            block_points=32, slice_width=256, chunk_group=8,
            use_pallas=True, pallas_interpret=True, band_width=band,
            pallas_transposed=transposed, route_band=route,
        ),
    )
    assert int(rp.window_overflow) == 0
    assert int(rp.compact_overflow) == 0
    n = len(setup[1])
    np.testing.assert_array_equal(rw.planes[:, :n], rp.planes[:, :n])
    np.testing.assert_array_equal(rw.keep[:n], rp.keep[:n])
    assert int(rw.num_attenuated) == int(rp.num_attenuated)


def test_pallas_pair_matches_window(setup):
    """The paired-chunk kernel (two interleaved extraction loops per grid
    step) must stay bit-identical to the window path too."""
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, point_chunk=256,
    )
    rw = _run(setup, SnowfallConfig(**base, assembly="window"))
    rp = _run(
        setup,
        SnowfallConfig(
            **base, assembly="dense", channel_capacity=128,
            block_points=32, slice_width=256, chunk_group=8,
            use_pallas=True, pallas_interpret=True, pallas_pair=True,
            band_width=0,  # banding supersedes pairing; pin the pair kernel
        ),
    )
    assert int(rp.window_overflow) == 0
    assert int(rp.compact_overflow) == 0
    n = len(setup[1])
    np.testing.assert_array_equal(rw.planes[:, :n], rp.planes[:, :n])
    np.testing.assert_array_equal(rw.keep[:n], rp.keep[:n])
    assert int(rw.num_attenuated) == int(rp.num_attenuated)


def test_pulse_pair_matches_window(setup):
    """The paired pulse kernel (two interleaved sweep/wave loops per grid
    step) must stay bit-identical to the window path."""
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, point_chunk=256,
    )
    rw = _run(setup, SnowfallConfig(**base, assembly="window"))
    rp = _run(
        setup,
        SnowfallConfig(
            **base, assembly="dense", channel_capacity=128,
            block_points=32, slice_width=256, chunk_group=8,
            use_pallas=True, pallas_interpret=True, pulse_pair=True,
            pulse_block=64,
        ),
    )
    assert int(rp.window_overflow) == 0
    assert int(rp.compact_overflow) == 0
    n = len(setup[1])
    np.testing.assert_array_equal(rw.planes[:, :n], rp.planes[:, :n])
    np.testing.assert_array_equal(rw.keep[:n], rp.keep[:n])
    assert int(rw.num_attenuated) == int(rp.num_attenuated)


def test_dense_full_360_scan(setup):
    """Full-360 scans cross the +-pi azimuth seam; the signed-azimuth sort
    plus the bank's +-2pi pad entries must keep dense == window."""
    calib, _, bank, order = setup
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    pc = synthetic_scan(n_azimuth=100, fov_deg=360.0, seed=4, calib=calib)
    pc = pc[np.argsort(pc[:, 4], kind="stable")][:8192]
    setup360 = (calib, pc, bank, order)
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=48, point_chunk=256,
    )
    rw = _run(setup360, SnowfallConfig(**base, assembly="window"))
    rd = _run(
        setup360,
        SnowfallConfig(
            **base, assembly="dense", channel_capacity=128,
            block_points=16, slice_width=384, chunk_group=8,
            use_pallas=True, pallas_interpret=True,
        ),
    )
    assert int(rd.window_overflow) == 0
    assert int(rd.channel_overflow) == 0
    n = len(pc)
    np.testing.assert_array_equal(rw.planes[:, :n], rd.planes[:, :n])
    np.testing.assert_array_equal(rw.keep[:n], rd.keep[:n])


def test_dense_seam_dedup_small_bank(setup):
    """A slice wider than a channel's particle count contains +-2pi wrap-pad
    COPIES of every particle (banks.py tiles with period count[row]); the
    dense candidate test must dedupe them, or seam scans double-count hits
    and spuriously overflow max_occluders. Window path gates by window
    membership, so equality + zero overflow proves the dedup."""
    calib, _, _, order = setup
    rng = np.random.default_rng(7)
    sets = []
    for _ in range(64):
        # cluster particles at the +-pi seam so wrap pads are exercised
        ang = np.pi + rng.uniform(-0.4, 0.4, 40)
        d = np.sqrt(rng.uniform(0.01, 1, 40)) * 40
        r = rng.uniform(0.01, 0.08, 40)
        sets.append(np.column_stack([d * np.cos(ang), d * np.sin(ang), r]))
    bank = build_bank(sets, window_size=256, wide_capacity=64)
    assert bank.angle.shape[1] > 40  # slices necessarily span duplicates
    pc = synthetic_scan(n_azimuth=100, fov_deg=360.0, seed=4, calib=calib)
    pc = pc[np.argsort(pc[:, 4], kind="stable")][:8192]
    s = (calib, pc, bank, order)
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=16, max_bumps=16, point_chunk=256,
    )
    rw = _run(s, SnowfallConfig(**base, assembly="window"))
    assert int(rw.occluder_overflow) == 0
    dense = dict(
        assembly="dense", channel_capacity=128, block_points=32,
        slice_width=256, chunk_group=8,
    )
    rd = _run(s, SnowfallConfig(**base, **dense))
    rp = _run(
        s,
        SnowfallConfig(
            **base, **dense, use_pallas=True, pallas_interpret=True
        ),
    )
    n = len(pc)
    for r in (rd, rp):
        assert int(r.occluder_overflow) == 0
        assert int(r.window_overflow) == 0
        np.testing.assert_array_equal(rw.planes[:, :n], r.planes[:, :n])
        np.testing.assert_array_equal(rw.keep[:n], r.keep[:n])


def test_dense_compact_overflow_detected(setup):
    """compact_capacity below the occluded-point count must be counted."""
    cfg = SnowfallConfig(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, assembly="dense",
        channel_capacity=128, block_points=32, slice_width=256, chunk_group=8,
        compact_capacity=16, pulse_chunk=16,
    )
    res = _run(setup, cfg)
    assert int(res.compact_overflow) > 0


def test_dense_touch_overflow_counted_and_equal(setup):
    """touch/scatter capacities below the touched/moved point counts must be
    COUNTED into compact_overflow (never silently truncate), and generous
    capacities must reproduce the full-scatter path bit-for-bit."""
    base = dict(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, assembly="dense",
        channel_capacity=128, block_points=32, slice_width=256, chunk_group=8,
    )
    full = _run(setup, SnowfallConfig(**base))  # auto caps engage
    assert int(full.compact_overflow) == 0
    # the full-capacity path (touch_capacity == compact cap disables the
    # second compaction) must agree bit-for-bit
    cap = 8192  # >= compact capacity: forces the legacy full-cap scatters
    legacy = _run(
        setup, SnowfallConfig(**base, touch_capacity=cap, scatter_capacity=cap)
    )
    np.testing.assert_array_equal(full.planes, legacy.planes)
    np.testing.assert_array_equal(full.keep, legacy.keep)
    # starved capacities: the deficit is counted, nothing silently truncates
    starved = _run(
        setup, SnowfallConfig(**base, touch_capacity=4, scatter_capacity=4)
    )
    assert int(starved.compact_overflow) > 0


def test_dense_slice_overflow_detected(setup):
    """A slice too narrow to cover its block's windows must be counted."""
    cfg = SnowfallConfig(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, assembly="dense",
        channel_capacity=128, block_points=128, slice_width=8, chunk_group=8,
    )
    res = _run(setup, cfg)
    assert int(res.window_overflow) > 0


def test_batch_fold_matches_per_frame(setup):
    """batch_fold=True folds a frame batch into ONE phase-A kernel grid
    (custom_vmap rule); every frame's outputs must equal both the unfolded
    vmap (serial per-frame launches) and the unbatched per-frame run."""
    import dataclasses

    calib, pc, bank, order = setup
    base = SnowfallConfig(
        max_points=8192, window_size=256, wide_capacity=64,
        max_occluders=48, max_bumps=24, point_chunk=256,
        assembly="dense", channel_capacity=128,
        block_points=32, slice_width=256, chunk_group=8,
        use_pallas=True, pallas_interpret=True,
    )
    padded = pad_cloud(pc, base.max_points)
    pts = jnp.stack([jnp.asarray(padded.points)] * 2)
    # second frame differs: reverse the channel->bank permutation
    orders = jnp.stack(
        [jnp.asarray(order, jnp.int32), jnp.asarray(order[::-1].copy(),
                                                    jnp.int32)]
    )
    masks = jnp.stack([jnp.asarray(padded.mask)] * 2)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    def run_batched(cfg):
        f = jax.vmap(
            snowfall_augment, in_axes=(0, 0, None, None, 0, 0, None, None)
        )
        return jax.jit(f, static_argnames=("cfg",))(
            pts, masks, jax.device_put(bank), calib_device_arrays(calib),
            orders, keys, cfg,
            (jnp.asarray(PLANE[0], jnp.float32), jnp.float32(PLANE[1])),
        )

    rf = run_batched(dataclasses.replace(base, batch_fold=True))
    ru = run_batched(base)
    for a, b in zip(rf, ru):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and against the unbatched single-frame path
    r0 = _run(setup, dataclasses.replace(base, batch_fold=True))
    np.testing.assert_array_equal(np.asarray(rf.planes[0]), r0.planes)
