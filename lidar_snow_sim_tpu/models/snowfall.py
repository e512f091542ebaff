"""Snowfall augmentation — the TPU-native core pipeline.

One jittable, fixed-shape function replaces the reference's thread-pool over
64 channels with Python loops over beams and particles
(`tools/snowfall/simulation.py:427-544`). Per scan:

1. stable-sort points by channel (reference sorts unstably; documented)
2. RANSAC ground plane -> incident angles -> adaptive noise threshold ->
   degree-2 noise polynomial over range (simulation.py:449-469)
3. per point (vmapped, chunked):
   - angular-window + wide-list candidate gather from the angle-sorted
     ParticleBank (replaces per-beam brute force over the whole bank)
   - exact intersection test + tangent intervals (ops.geometry)
   - nearest-K occluder selection + first-claim sweep (ops.sweep)
   - pulse re-simulation over the 1230-bin quantized grid (ops.waveform)
   - attenuate / scatter / keep decision (simulation.py:151-192)
4. noise-floor keep mask + statistics (simulation.py:516-530)

Capacity overflows (angular window, occluder set, bump set) are counted in
the result diagnostics; parity tests require them to be zero.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_snow_sim_tpu.calib import SensorCalib
from lidar_snow_sim_tpu.config import SPEED_OF_LIGHT, SnowfallConfig
from lidar_snow_sim_tpu.ops.fitting import (
    masked_polyfit2,
    polyval2,
    ransac_plane,
)
from lidar_snow_sim_tpu.ops.geometry import beam_limits, candidate_intervals
from lidar_snow_sim_tpu.ops.laser import estimate_laser_parameters
from lidar_snow_sim_tpu.ops.sweep import occlusion_sweep
from lidar_snow_sim_tpu.ops.waveform import waveform_peak, xsi
from lidar_snow_sim_tpu.sampling.banks import LUT_BINS, LUT_HI, LUT_LO

_INF = jnp.float32(jnp.inf)


def dense_slot_count(cfg, num_lasers: int, pallas: bool = True) -> int:
    """Slot count n2 of the dense assembly: num_lasers * channel_capacity,
    plus one extra blk-aligned window per channel on the pallas path
    (snowfall_augment_dense's `bpc1` alignment spill)."""
    blocks = cfg.channel_capacity // cfg.block_points + (1 if pallas else 0)
    return num_lasers * blocks * cfg.block_points


def _cap_from_slots(n2: int, pulse_chunk: int) -> int:
    """A quarter of the slots, rounded UP to a pulse_chunk multiple."""
    return -(-max(n2 // 4, pulse_chunk) // pulse_chunk) * pulse_chunk


def default_compact_capacity(cfg, num_lasers: int, pallas: bool = True) -> int:
    """Default compact capacity of the dense assembly.

    Shared by snowfall_augment_dense, the capacity healers
    (SnowfallAugmenter, datagen) and bench's roofline model so a
    healed/doubled value reproduces the actual default and stays
    pulse_chunk-divisible (doubling a multiple keeps it one)."""
    return _cap_from_slots(dense_slot_count(cfg, num_lasers, pallas),
                           cfg.pulse_chunk)


class SnowfallResult(NamedTuple):
    # (5, N) PLANE-MAJOR augmented output: rows x, y, z, intensity, label.
    # Plane-major is the TPU-correct layout: a trailing 5-wide minor axis
    # pads 25.6x under (8, 128) HBM tiling (round-2 lesson), so a (N, 5)
    # device output would cost ~0.3 GB/step of padded traffic at bench
    # shapes. Host wrappers transpose back to the reference's (n, 5) rows
    # (simulation.py:589-599 returns row-major pc) at the fetch boundary.
    planes: jax.Array
    keep: jax.Array            # (N,) bool: survives noise floor / scattering
    num_attenuated: jax.Array  # i32
    num_removed: jax.Array     # i32
    avg_intensity_diff: jax.Array  # i32 (trunc toward zero, reference int())
    window_overflow: jax.Array     # i32: candidates beyond window/slice capacity
    occluder_overflow: jax.Array   # i32: intersecting beyond max_occluders
    bump_overflow: jax.Array       # i32: nonzero-ratio beyond max_bumps
    channel_overflow: jax.Array    # i32: points beyond channel_capacity (dense)
    compact_overflow: jax.Array    # i32: occluded points beyond
    # compact_capacity, plus touched/moved points beyond touch_capacity /
    # scatter_capacity (all three grow together in the host wrappers)


def _batched_searchsorted(sorted_rows, rows, targets, length: int):
    """First index i in sorted_rows[rows] with value >= target (side='left'),
    without materializing the gathered rows: log2(K) scalar-gather steps."""
    p = targets.shape[0]
    lo = jnp.zeros(p, dtype=jnp.int32)
    hi = jnp.full(p, length, dtype=jnp.int32)
    steps = int(np.ceil(np.log2(max(length, 2)))) + 1

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = sorted_rows[rows, jnp.clip(mid, 0, length - 1)]
        go_right = v < targets
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _occluder_phase(
    xyz,
    cand,            # (P, C, 4) candidates: x, y, r, dist
    cfg: SnowfallConfig,
):
    """Intersection test + nearest-K occluder selection for P points.

    Returns (occ_a1, occ_a2, occ_dist, occ_valid (P, K)), occ_overflow (P,).
    Occluders are sorted by ascending range = the reference's claim priority.
    """
    d_orig = jnp.linalg.norm(xyz, axis=-1)
    right, left = beam_limits(xyz[:, 0], xyz[:, 1], cfg.beam_divergence_rad)

    a1, a2, hit = jax.vmap(candidate_intervals)(
        right,
        left,
        cand[:, :, 0],
        cand[:, :, 1],
        cand[:, :, 2],
        cand[:, :, 3],
        jnp.ones(cand.shape[:2], dtype=bool),
        d_orig,
    )

    n_hit = jnp.sum(hit, axis=1)
    occ_overflow = jnp.maximum(n_hit - cfg.max_occluders, 0)

    # nearest max_occluders by range = the reference's claim priority
    # (a "smarter" two-stage grouped top-k measured 4x SLOWER here: its
    # take_along_axis gather is exactly the op XLA can't tile on TPU)
    score = jnp.where(hit, cand[:, :, 3], _INF)
    neg_top, top_idx = jax.lax.top_k(-score, cfg.max_occluders)
    occ_valid = neg_top > -_INF
    occ_dist = -neg_top
    occ_a1 = jnp.take_along_axis(a1, top_idx, axis=1)
    occ_a2 = jnp.take_along_axis(a2, top_idx, axis=1)
    return occ_a1, occ_a2, occ_dist, occ_valid, occ_overflow


def _pulse_phase(
    xyz,
    intensity,
    point_valid,
    occ_a1,
    occ_a2,
    occ_dist,
    occ_valid,
    min_int,
    max_int,
    focal_slope,
    focal_offset,
    range_grid,
    cfg: SnowfallConfig,
):
    """First-claim sweep + pulse re-simulation + label decision for P points
    with pre-selected occluders."""
    beam_rad = cfg.beam_divergence_rad
    ipm = cfg.intervals_per_meter
    c_tau = SPEED_OF_LIGHT * cfg.tau_h

    d_orig = jnp.linalg.norm(xyz, axis=-1)
    right, left = beam_limits(xyz[:, 0], xyz[:, 1], beam_rad)

    ratio, remainder, touched = jax.vmap(
        occlusion_sweep, in_axes=(0, 0, 0, 0, 0, None)
    )(right, left, occ_a1, occ_a2, occ_valid, beam_rad)
    touched_any = jnp.any(touched, axis=1)

    # bump selection: keep the max_bumps largest nonzero occlusion ratios
    n_bumps = jnp.sum(ratio > 0, axis=1)
    bump_overflow = jnp.maximum(n_bumps - cfg.max_bumps, 0)
    bump_ratio, bump_idx = jax.lax.top_k(ratio, cfg.max_bumps)
    bump_r = jnp.take_along_axis(occ_dist, bump_idx, axis=1)

    # all amplitudes use the snowflake scale 0.9*max_intensity (the CA_P0
    # carry-over quirk; see ops/waveform.py docstring), including the
    # partially-unoccluded hard target appended as the last bump
    amp_scale = 0.9 * max_int
    bump_amp = amp_scale[:, None] * bump_ratio * xsi(bump_r) / bump_r**2
    bump_amp = jnp.where(bump_ratio > 0, bump_amp, 0.0)
    tgt_amp = amp_scale * remainder * xsi(d_orig) / d_orig**2
    all_r = jnp.concatenate([bump_r, d_orig[:, None]], axis=1)
    all_amp = jnp.concatenate([bump_amp, tgt_amp[:, None]], axis=1)

    i_peak, peak_idx = jax.vmap(waveform_peak, in_axes=(0, 0, None, None, None))(
        all_r, all_amp, range_grid, ipm, cfg.tau_h
    )
    d_max = peak_idx.astype(jnp.float32) / ipm - c_tau / 2

    # focal-slope re-adjustment and clipping (simulation.py:155-156)
    i_max = i_peak + max_int * focal_slope * jnp.abs(
        focal_offset - (1 - d_max / cfg.lidar_range) ** 2
    )
    i_max = jnp.clip(i_max, min_int, max_int)

    attenuated = jnp.abs(d_max - d_orig) < cfg.range_tolerance
    new_i = jnp.floor(i_max)  # int() truncation; i_max >= min_int >= 0

    label = jnp.where(touched_any, jnp.where(attenuated, 1.0, 2.0), 0.0)
    scale = jnp.where(touched_any & ~attenuated, d_max / d_orig, 1.0)
    new_xyz = xyz * scale[:, None]
    new_intensity = jnp.where(
        touched_any, jnp.clip(new_i, min_int, max_int), intensity
    )
    diff = jnp.where(
        touched_any & attenuated & point_valid, 0.9 * max_int - new_i, 0.0
    )

    stats_valid = point_valid
    return (
        new_xyz,
        new_intensity,
        label,
        jnp.sum(diff),
        jnp.sum(jnp.where(stats_valid, bump_overflow, 0)),
    )


def _per_point_kernel(
    xyz,
    intensity,
    point_valid,
    bank_row,
    cand,            # (P, C, 4) gathered candidates: x, y, r, dist
    n_window,        # (P,) exact angular-window population (overflow check)
    min_int,
    max_int,
    focal_slope,
    focal_offset,
    range_grid,
    cfg: SnowfallConfig,
):
    """Occlusion + pulse re-simulation for a chunk of P points
    (_occluder_phase composed with _pulse_phase; the dense assembly runs the
    two phases separately with a compaction in between)."""
    occ_a1, occ_a2, occ_dist, occ_valid, occ_overflow = _occluder_phase(
        xyz, cand, cfg
    )
    new_xyz, new_intensity, label, diff_sum, bump_of = _pulse_phase(
        xyz, intensity, point_valid, occ_a1, occ_a2, occ_dist, occ_valid,
        min_int, max_int, focal_slope, focal_offset, range_grid, cfg,
    )
    stats_valid = point_valid
    return (
        new_xyz,
        new_intensity,
        label,
        diff_sum,
        jnp.sum(jnp.where(stats_valid, occ_overflow, 0)),
        bump_of,
        jnp.sum(
            jnp.where(stats_valid, jnp.maximum(n_window - cfg.window_size, 0), 0)
        ),
    )


def snowfall_augment(
    points,
    mask,
    bank,
    calib_arrays,
    order,
    key,
    cfg: SnowfallConfig,
    plane=None,
):
    """Jittable full-scan snowfall augmentation.

    Args:
      points: (N, 5) float32 padded scan (x, y, z, intensity, channel)
      mask:   (N,) bool validity
      bank:   ParticleBank (device pytree)
      calib_arrays: tuple of (min_intensity, focal_distance, focal_slope,
        focal_offset, max_intensity) per channel — SensorCalib fields
      order:  (num_channels,) i32 channel -> bank-row permutation (the
        reference's shuffled particle-file assignment, injected for
        reproducibility)
      key:    PRNG key for the RANSAC plane fit
      cfg:    static SnowfallConfig

    Returns SnowfallResult with full-capacity arrays (compact on host with
    utils.compact_cloud using result.keep). cfg.assembly selects the
    candidate-assembly strategy: "window" (per-point gathered windows; output
    in channel-sorted order) or "dense" (per-block shared bank slices, no
    big gathers — see snowfall_augment_dense; output in original order).
    """
    if cfg.assembly == "dense":
        return snowfall_augment_dense(
            points, mask, bank, calib_arrays, order, key, cfg, plane=plane
        )
    n = points.shape[0]
    assert n % cfg.point_chunk == 0, "max_points must be divisible by point_chunk"

    min_int_lut, _, fs_lut, fo_lut, max_int_lut = calib_arrays

    # 1. stable sort by channel, padding last
    ch_key = jnp.where(mask, points[:, 4], 1e9)
    perm = jnp.argsort(ch_key, stable=True)
    points = points[perm]
    mask = mask[perm]

    xyz = points[:, :3]
    intensity = points[:, 3]
    channel = jnp.clip(points[:, 4].astype(jnp.int32), 0, order.shape[0] - 1)
    dist = jnp.linalg.norm(xyz, axis=-1)

    # 2. plane -> incident angles -> adaptive noise polynomial
    if plane is None:
        w, h = ransac_plane(xyz, mask, key, trials=cfg.ransac_trials)
    else:
        w, h = plane  # injected (parity tests / precomputed planes)
    hog = xyz @ w + h
    ground = mask & (hog < cfg.ground_delta) & (hog > -cfg.ground_delta)
    incident = jnp.arccos(
        jnp.clip((xyz @ w) / (jnp.maximum(dist, 1e-12) * jnp.linalg.norm(w)), -1, 1)
    )
    _, threshold = estimate_laser_parameters(
        xyz, intensity, incident, ground, noise_floor=cfg.noise_floor
    )
    threshold = threshold * jnp.cos(incident)
    noise_poly = masked_polyfit2(dist, threshold, ground)
    noise_at = polyval2(noise_poly, dist)

    # 3. per-point channel LUTs and candidate windows
    bank_row = order[channel]
    min_int = min_int_lut[channel]
    fs = fs_lut[channel]
    fo = fo_lut[channel]
    max_int = max_int_lut[channel]

    # signed azimuth, matching the bank's sort convention (banks.py)
    center = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    delta = cfg.beam_divergence_rad / 2 + cfg.wide_threshold
    k_ext = bank.angle.shape[1]
    lo = _batched_searchsorted(bank.angle, bank_row, center - delta, k_ext)
    hi = _batched_searchsorted(bank.angle, bank_row, center + delta, k_ext)
    n_window = hi - lo

    range_grid = jnp.asarray(cfg.range_grid())

    def chunk_fn(args):
        (xyz_c, int_c, valid_c, row_c, lo_c, nw_c, mi_c, fs_c, fo_c, mx_c,
         center_c) = args
        p = xyz_c.shape[0]
        # windowed candidates, gated to the angular window to avoid duplicate
        # wraparound copies (banks.py docstring)
        widx = jnp.clip(lo_c[:, None] + jnp.arange(cfg.window_size)[None, :],
                        0, k_ext - 1)
        wcand = bank.data[row_c[:, None], widx]               # (P, S, 4)
        wang = bank.angle[row_c[:, None], widx]
        in_win = (wang >= (center_c - delta)[:, None]) & (
            wang <= (center_c + delta)[:, None]
        )
        # out-of-window entries: push to infinite range so every test fails
        wcand = wcand.at[:, :, 3].set(jnp.where(in_win, wcand[:, :, 3], 1e9))
        wide = bank.wide[row_c]                               # (P, W, 4)
        cand = jnp.concatenate([wcand, wide], axis=1)

        return _per_point_kernel(
            xyz_c, int_c, valid_c, row_c, cand, nw_c,
            mi_c, mx_c, fs_c, fo_c, range_grid, cfg,
        )

    n_chunks = n // cfg.point_chunk
    chunked = lambda a: a.reshape((n_chunks, cfg.point_chunk) + a.shape[1:])
    outs = jax.lax.map(
        chunk_fn,
        (
            chunked(xyz), chunked(intensity), chunked(mask), chunked(bank_row),
            chunked(lo), chunked(n_window), chunked(min_int), chunked(fs),
            chunked(fo), chunked(max_int), chunked(center),
        ),
    )
    (new_xyz, new_int, label, diff_c, occ_of, bump_of, win_of) = outs
    new_xyz = new_xyz.reshape(n, 3)
    new_int = new_int.reshape(n)
    label = label.reshape(n)

    # 4. round intensities, noise-floor keep rule, stats
    new_int = jnp.round(new_int)
    keep = mask & ((label == 2) | (new_int > noise_at))
    num_removed = jnp.sum(mask & ~keep).astype(jnp.int32)
    num_attenuated = jnp.sum(keep & (label == 1)).astype(jnp.int32)

    diff_sum = jnp.sum(diff_c)
    avg_diff = jnp.where(
        num_attenuated > 0,
        (diff_sum / jnp.maximum(num_attenuated, 1)).astype(jnp.int32),
        0,
    )

    out_planes = jnp.stack(
        [new_xyz[:, 0], new_xyz[:, 1], new_xyz[:, 2], new_int, label]
    )
    return SnowfallResult(
        planes=out_planes,
        keep=keep,
        num_attenuated=num_attenuated,
        num_removed=num_removed,
        avg_intensity_diff=avg_diff,
        window_overflow=jnp.sum(win_of).astype(jnp.int32),
        occluder_overflow=jnp.sum(occ_of).astype(jnp.int32),
        bump_overflow=jnp.sum(bump_of).astype(jnp.int32),
        channel_overflow=jnp.int32(0),
        compact_overflow=jnp.int32(0),
    )


def _plane_and_noise(xyz, intensity, mask, dist, key, cfg, plane):
    """Shared preamble: ground plane -> incident angles -> adaptive noise
    polynomial evaluated at every point's range (simulation.py:449-469)."""
    if plane is None:
        w, h = ransac_plane(xyz, mask, key, trials=cfg.ransac_trials)
    else:
        w, h = plane
    hog = xyz @ w + h
    ground = mask & (hog < cfg.ground_delta) & (hog > -cfg.ground_delta)
    incident = jnp.arccos(
        jnp.clip((xyz @ w) / (jnp.maximum(dist, 1e-12) * jnp.linalg.norm(w)), -1, 1)
    )
    _, threshold = estimate_laser_parameters(
        xyz, intensity, incident, ground, noise_floor=cfg.noise_floor
    )
    threshold = threshold * jnp.cos(incident)
    noise_poly = masked_polyfit2(dist, threshold, ground)
    return polyval2(noise_poly, dist)


def snowfall_augment_dense(
    points,
    mask,
    bank,
    calib_arrays,
    order,
    key,
    cfg: SnowfallConfig,
    plane=None,
):
    """Dense-slice snowfall augmentation — the TPU fast path.

    The window path's per-point candidate gather (bank.data[row, widx] for
    every beam) is the measured hot spot on TPU (XLA gathers don't tile).
    Here points are laid out (channel, azimuth)-sorted into fixed
    (num_channels, channel_capacity) slots; each block of
    cfg.block_points consecutive beams shares ONE contiguous slice of
    cfg.slice_width angle-sorted bank entries, fetched with a single dynamic
    slice, and every beam in the block is tested densely against the whole
    slice (the intersection predicate is exact, so testing a superset changes
    nothing). Results are scattered back to the ORIGINAL point order — unlike
    the window path, which returns channel-sorted points.

    Coverage is checked, not assumed: if a block's beams need bank entries
    beyond its slice, the deficit is counted in window_overflow; points
    beyond channel_capacity count in channel_overflow. The host wrapper
    raises on either.
    """
    n = points.shape[0]
    n_ch = order.shape[0]
    pch = cfg.channel_capacity
    blk = cfg.block_points
    # a slice can never usefully exceed the extended bank row; small banks
    # (light occupancy) would otherwise under-cover and report overflow
    w_sl = min(cfg.slice_width, bank.angle.shape[1])
    grp = cfg.chunk_group
    assert pch % blk == 0, "channel_capacity must be divisible by block_points"
    blocks_per_ch = pch // blk

    min_int_lut, _, fs_lut, fo_lut, max_int_lut = calib_arrays

    xyz = points[:, :3]
    intensity = points[:, 3]
    channel = jnp.clip(points[:, 4].astype(jnp.int32), 0, n_ch - 1)
    dist = jnp.linalg.norm(xyz, axis=-1)
    noise_at = _plane_and_noise(xyz, intensity, mask, dist, key, cfg, plane)

    # --- (channel, azimuth) sort; signed azimuth to match the bank's sort
    # convention (banks.py) and keep FOV scans contiguous ---
    az = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    sort_key = jnp.where(mask, channel.astype(jnp.float32) * 8.0 + az, 1e9)
    delta = cfg.beam_divergence_rad / 2 + cfg.wide_threshold
    k_ext = bank.angle.shape[1]
    range_grid = jnp.asarray(cfg.range_grid())

    # --- phase A: dense intersection + nearest-K occluder selection ---
    # Mosaic DMA requires lane-dim starts aligned to 128: the pallas slice
    # start is rounded DOWN to a 128 multiple with 128 extra width, which can
    # only widen coverage. Falls back to XLA when the bank row is too short
    # for the aligned slice.
    w_pallas = w_sl + 128
    # banded phase A (see config.band_width): per-group dual bands are
    # in-VMEM views of the chunk-wide slice, so the slice condition is the
    # same as the full-slice kernel's
    band = cfg.band_width if (
        cfg.band_width > 0 and blk % cfg.band_group == 0
        and w_pallas >= 2 * cfg.band_width
    ) else 0
    # span-routed phase A (config.route_band): needs the same per-group
    # stats as the banded kernel; mutually exclusive with band_width
    routed = (
        cfg.route_band > 0 and not band
        and blk % cfg.band_group == 0
        and w_pallas >= cfg.route_band
    )
    use_pallas = (
        cfg.use_pallas
        and (cfg.pallas_interpret or jax.default_backend() == "tpu")
        and k_ext >= w_pallas
        # the K-outer (3K, n_chunks*blk) output writes (3K, blk) lane
        # blocks, which Mosaic requires to be 128-divisible; smaller blocks
        # fall back to the XLA dense path (interpret mode doesn't enforce)
        and (cfg.pallas_interpret or blk % 128 == 0)
    )
    if use_pallas:
        from lidar_snow_sim_tpu.ops.pallas_occluders import (
            make_pallas_occluder_phase,
            point_features,
        )

        # Gather-free slot layout: x/y/z/intensity/orig-index RIDE the
        # (channel, azimuth) sort as payload operands, and chunks are
        # blk-aligned WINDOWS of the sorted order. The former slot layout
        # ((C, pch) slot-index gather at :476 plus the 5-row column gather
        # it fed at :486) was 14.5 ms/step — 25% of the bench step. Azimuth
        # is NOT a payload: each multi-operand sort column is ~0.7 ms/step
        # of staging, and az is recomputed exactly (same atan2 on the same
        # f32 x/y) at the 2 x n_chunks window-bound rows only.
        (s_key, sx, sy, sz, si, sperm) = jax.lax.sort(
            (
                sort_key, xyz[:, 0], xyz[:, 1], xyz[:, 2], intensity,
                jnp.arange(n, dtype=jnp.int32),
            ),
            num_keys=1, is_stable=True,
        )
        n_pad = -(-n // blk) * blk
        if n_pad != n:
            pw = n_pad - n
            s_key = jnp.pad(s_key, (0, pw), constant_values=1e9)
            sx, sy, sz, si = (
                jnp.pad(a, (0, pw)) for a in (sx, sy, sz, si)
            )
            sperm = jnp.pad(sperm, (0, pw), constant_values=n)
        bounds = jnp.searchsorted(
            s_key, 8.0 * jnp.arange(n_ch + 1, dtype=jnp.float32) - 4.0
        )
        start = bounds[:-1]
        count_full = bounds[1:] - bounds[:-1]
        channel_overflow = jnp.sum(jnp.maximum(count_full - pch, 0))
        end = start + jnp.minimum(count_full, pch)

        # one EXTRA window per channel: aligning a channel's first window
        # down to a blk boundary can push its last points past window
        # blocks_per_ch - 1. Windows whose aligned start would fall past
        # n_pad - blk never contain in-channel rows (see valid_blk) and are
        # clipped dead rather than wrapped, so no row is claimed twice.
        bpc1 = blocks_per_ch + 1
        n_chunks = n_ch * bpc1
        ch_of_chunk = jnp.repeat(jnp.arange(n_ch), bpc1)       # (n_chunks,)
        b_of_chunk = jnp.tile(jnp.arange(bpc1), n_ch)
        start_c = start[ch_of_chunk]
        end_c = end[ch_of_chunk]
        w0_raw = (start_c // blk) * blk + b_of_chunk * blk
        alive = w0_raw <= n_pad - blk
        w0 = jnp.clip(w0_raw, 0, n_pad - blk).astype(jnp.int32)
        row_of_chunk = order[ch_of_chunk]

        pos = jnp.arange(blk, dtype=jnp.int32)
        rank_blk = w0[:, None] + pos[None, :]                  # (n_chunks, blk)
        valid_blk = (
            alive[:, None]
            & (rank_blk >= start_c[:, None])
            & (rank_blk < end_c[:, None])
        )

        # azimuth ASCENDS within a channel (the sort key is ch*8 + az), so a
        # window's az bounds are its first/last in-channel elements — two
        # gathers + exact atan2 recompute (same f32 ops as the sort key's
        # az, so ordering is consistent). With banding the bounds are
        # per-GROUP (n_chunks, G): each band_group of 8 consecutive points
        # gets its own narrow band slice.
        if band or routed:
            gsz = cfg.band_group
            g_dim = blk // gsz
            lo_row = w0[:, None] + (
                jnp.arange(g_dim, dtype=jnp.int32) * gsz
            )[None, :]                                     # (n_chunks, G)
            a_lo = jnp.maximum(lo_row, start_c[:, None])
            a_hi = jnp.minimum(lo_row + gsz, end_c[:, None])
            rows_b = row_of_chunk[:, None]

            # GATHER-FREE group az bounds. Per-index gathers at (n_chunks,
            # G) scale cost ~5 ms/step (measured; the repo's "small gathers
            # pay per-index" lesson), so instead: stats over every ALIGNED
            # gsz-row window of the sorted order (pure elementwise +
            # reshape), sliced per channel (64 wide dynamic slices — pay
            # per-row, not per-index). A window can straddle two channels,
            # so each window carries bounds under both the first-row-channel
            # and last-row-channel hypotheses and the chunk picks its own.
            az_all = jnp.arctan2(sy, sx)                   # (n_pad,)
            ch_row = jnp.round(s_key / 8.0).astype(jnp.int32)
            wz = az_all.reshape(-1, gsz)
            wch = ch_row.reshape(-1, gsz)
            chf = wch[:, 0]
            chl = wch[:, -1]
            mf = wch == chf[:, None]
            ml = wch == chl[:, None]
            minf = jnp.min(jnp.where(mf, wz, jnp.inf), axis=1)
            maxf = jnp.max(jnp.where(mf, wz, -jnp.inf), axis=1)
            minl = jnp.min(jnp.where(ml, wz, jnp.inf), axis=1)
            maxl = jnp.max(jnp.where(ml, wz, -jnp.inf), axis=1)
            # per-channel contiguous window ranges; pad so the slices of
            # tail channels never clamp-shift (which would misalign groups)
            nwin = bpc1 * (blk // gsz)
            wstart = ((start // blk) * blk // gsz).astype(jnp.int32)

            # ONE stacked (6, n_wins) slice per channel instead of six
            # separate vmapped slice launches (channel ids <= 64 are exact
            # in f32, so the int rows ride the float stack losslessly)
            stacked = jnp.stack([
                jnp.concatenate([chf.astype(jnp.float32),
                                 jnp.full((nwin,), -1.0, jnp.float32)]),
                jnp.concatenate([chl.astype(jnp.float32),
                                 jnp.full((nwin,), -1.0, jnp.float32)]),
                jnp.concatenate([minf, jnp.full((nwin,), jnp.inf)]),
                jnp.concatenate([maxf, jnp.full((nwin,), -jnp.inf)]),
                jnp.concatenate([minl, jnp.full((nwin,), jnp.inf)]),
                jnp.concatenate([maxl, jnp.full((nwin,), -jnp.inf)]),
            ])                                             # (6, n_wins+pad)
            sl = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    stacked, (0, s), (6, nwin)
                )
            )(wstart)                                      # (n_ch, 6, nwin)
            cg = sl.transpose(1, 0, 2).reshape(6, n_chunks, g_dim)
            chf_cg = cg[0].astype(jnp.int32)
            chl_cg = cg[1].astype(jnp.int32)
            minf_cg, maxf_cg, minl_cg, maxl_cg = cg[2], cg[3], cg[4], cg[5]
            ch_c = ch_of_chunk[:, None]
            sel_f = chf_cg == ch_c
            sel_l = chl_cg == ch_c
            has = alive[:, None] & (a_lo < a_hi)
            # a window can hold rows of THREE channels (a tiny mid channel
            # matches neither hypothesis): force the full-period fallback —
            # lo = 0 with ±inf bounds, correct when count <= band (dedup
            # keeps one copy of every particle) and otherwise counted in
            # cover_overflow so the band grows. Essentially unreachable on
            # real scans (every live channel has hundreds of FOV points).
            min_az_b = jnp.where(
                sel_f, minf_cg,
                jnp.where(sel_l, minl_cg, jnp.float32(-1e9)),
            )
            max_az_b = jnp.where(
                sel_f, maxf_cg,
                jnp.where(sel_l, maxl_cg, jnp.float32(1e9)),
            )
        else:
            a_lo = jnp.maximum(w0, start_c)
            a_hi = jnp.minimum(w0 + blk, end_c)
            has = alive & (a_lo < a_hi)
            rows_b = row_of_chunk
        if band or routed:
            min_az = jnp.where(has, min_az_b, jnp.inf)
            max_az = jnp.where(has, max_az_b, -jnp.inf)
        else:
            ia = jnp.clip(a_lo, 0, n_pad - 1)
            ib = jnp.clip(a_hi - 1, 0, n_pad - 1)
            min_az = jnp.where(
                has, jnp.arctan2(sy[ia], sx[ia]), jnp.inf
            )
            max_az = jnp.where(
                has, jnp.arctan2(sy[ib], sx[ib]), -jnp.inf
            )
        # slice bounds from the bank's precomputed azimuth-bin LUT
        # (banks.LUT_*): one tiny gather per bound instead of a ~15-step
        # sequential binary-search chain (3 ms/step at bench shapes). The
        # +-1-bin guard keeps the bounds CONSERVATIVE (lo' <= true lo,
        # hi' >= true hi) against floor rounding, which can only widen the
        # required coverage; cover_overflow stays a safe over-check.
        inv_w = LUT_BINS / (LUT_HI - LUT_LO)
        b_lo = jnp.clip(
            jnp.floor((min_az - delta - LUT_LO) * inv_w) - 1, 0, LUT_BINS
        ).astype(jnp.int32)
        b_hi = jnp.clip(
            jnp.floor((max_az + delta - LUT_LO) * inv_w) + 2, 0, LUT_BINS
        ).astype(jnp.int32)
        lo_raw = bank.lut[rows_b, b_lo]
        hi_req = bank.lut[rows_b, b_hi]

        feats_b = point_features(
            sx, sy, sz, cfg.beam_divergence_rad
        ).reshape(n_pad // blk, blk, -1)
        transposed = (cfg.pallas_transposed and not band and not routed
                      and not cfg.pallas_pair)
        if transposed:
            # (n_blocks, N_FEAT, blk): feature rows on sublanes, point
            # lanes — the layout _kernel_t's relayout-free trips need
            feats_b = feats_b.transpose(0, 2, 1)
        run = make_pallas_occluder_phase(
            blk=blk, w_sl=w_pallas, wide_cap=bank.wide_t.shape[2],
            k_occ=cfg.max_occluders, beam_rad=cfg.beam_divergence_rad,
            interpret=cfg.pallas_interpret, transposed=transposed,
            pair=(cfg.pallas_pair and n_chunks % 2 == 0 and not band
                  and not routed),
            band=band, band_group=cfg.band_group,
            route_band=cfg.route_band if routed else 0,
            batch_fold=cfg.batch_fold,
            # only the first wide_capacity wide lanes can hold real
            # candidates; slicing the rest out of the banded compute keeps
            # the per-group candidate width at a lane-tile multiple
            # (2*240 + 32 = 512) instead of paying for 128 filler lanes
            wide_sl=min(
                bank.wide_t.shape[2],
                max(32, -(-cfg.wide_capacity // 32) * 32),
            ),
        )
        if band:
            # per-chunk slice anchor from the chunk hull (the min/max of
            # the per-group stats), exactly like the full-slice kernel
            c_min_az = jnp.min(jnp.where(has, min_az_b, jnp.inf), axis=1)
            c_max_az = jnp.max(jnp.where(has, max_az_b, -jnp.inf), axis=1)
            cb_lo = jnp.clip(
                jnp.floor((c_min_az - delta - LUT_LO) * inv_w) - 1,
                0, LUT_BINS,
            ).astype(jnp.int32)
            cb_hi = jnp.clip(
                jnp.floor((c_max_az + delta - LUT_LO) * inv_w) + 2,
                0, LUT_BINS,
            ).astype(jnp.int32)
            lo_c_raw = bank.lut[row_of_chunk, cb_lo]
            hi_c_req = bank.lut[row_of_chunk, cb_hi]
            lo_c = jnp.clip(lo_c_raw, 0, k_ext - w_pallas)
            lo_c = (lo_c // 128) * 128
            # chunk-level DMA coverage (growth lever: slice_width)
            chunk_unc = (bank.count[row_of_chunk] > w_pallas) & (
                hi_c_req > lo_c + w_pallas
            )
            chunk_cover_of = jnp.sum(
                jnp.where(chunk_unc,
                          jnp.maximum(hi_c_req - (lo_c + w_pallas), 0), 0)
            )
            # dual bands per group: head-anchored (aligned DOWN from the
            # left edge) and tail-anchored (aligned UP so the band END
            # covers the right edge), both clamped into the chunk slice so
            # the in-VMEM views stay in bounds (all quantities 128-aligned)
            lo_a = (jnp.clip(lo_raw, 0, k_ext - band) // 128) * 128
            lo_b = jnp.clip(-(-(hi_req - band) // 128) * 128, 0,
                            k_ext - band)
            lo_a = jnp.clip(lo_a, lo_c[:, None],
                            lo_c[:, None] + (w_pallas - band))
            lo_b = jnp.clip(lo_b, lo_c[:, None],
                            lo_c[:, None] + (w_pallas - band))
            glo_vec = jnp.stack(
                [lo_a, lo_b], axis=2
            ).astype(jnp.int32)                    # (n_chunks, G, 2)
            occ_a12d, occ_of_pts, unc_pts = run(
                feats_b, (w0 // blk).astype(jnp.int32), row_of_chunk,
                lo_c.astype(jnp.int32),
                lo_a.reshape(-1).astype(jnp.int32),
                lo_b.reshape(-1).astype(jnp.int32),
                glo_vec, bank.count.astype(jnp.int32),
                bank.data_t, bank.wide_t, delta,
            )                                      # (n_chunks, 3K, blk)
            # a point is uncovered only if BOTH checks flag it: the
            # in-kernel angle-edge check cannot see an EMPTY needed window
            # (seam gaps in the bank look like uncovered edges), and the
            # hull-index check cannot see an azimuth GAP between clusters
            # (its interval spans the gap). Each is conservative where the
            # other is exact, so their AND is still an over-count of true
            # coverage misses, never an under-count.
            hull_unc = (bank.count[rows_b] > band) & (hi_req > lo_a + band)
            g_dim = blk // cfg.band_group
            cover_overflow = chunk_cover_of + jnp.sum(
                jnp.where(
                    valid_blk.reshape(n_chunks, g_dim, cfg.band_group)
                    & hull_unc[:, :, None],
                    unc_pts.reshape(n_chunks, g_dim, cfg.band_group),
                    0,
                )
            )
        elif routed:
            band_r = cfg.route_band
            # chunk hull anchor (same as the banded/full-slice kernels)
            c_min_az = jnp.min(jnp.where(has, min_az_b, jnp.inf), axis=1)
            c_max_az = jnp.max(jnp.where(has, max_az_b, -jnp.inf), axis=1)
            cb_lo = jnp.clip(
                jnp.floor((c_min_az - delta - LUT_LO) * inv_w) - 1,
                0, LUT_BINS,
            ).astype(jnp.int32)
            cb_hi = jnp.clip(
                jnp.floor((c_max_az + delta - LUT_LO) * inv_w) + 2,
                0, LUT_BINS,
            ).astype(jnp.int32)
            lo_c_raw = bank.lut[row_of_chunk, cb_lo]
            hi_c_req = bank.lut[row_of_chunk, cb_hi]
            lo_c = jnp.clip(lo_c_raw, 0, k_ext - w_pallas)
            lo_c = (lo_c // 128) * 128
            # chunk-level DMA coverage (growth lever: slice_width)
            chunk_unc = (bank.count[row_of_chunk] > w_pallas) & (
                hi_c_req > lo_c + w_pallas
            )
            chunk_cover_of = jnp.sum(
                jnp.where(chunk_unc,
                          jnp.maximum(hi_c_req - (lo_c + w_pallas), 0), 0)
            )
            # one head-anchored band per group, clamped into the chunk
            # slice so the in-VMEM views stay in bounds (128-aligned)
            lo_a = (jnp.clip(lo_raw, 0, k_ext - band_r) // 128) * 128
            # floor the upper clamp to a 128-multiple so lo_a stays
            # 128-aligned for NON-128-multiple bands too (the kernel's
            # in-VMEM views assert 128-aligned starts)
            lo_a = jnp.clip(lo_a, lo_c[:, None],
                            lo_c[:, None] + ((w_pallas - band_r) // 128) * 128)
            # ROUTE: a group fits iff its conservative LUT window provably
            # lies inside its band (or the band holds a full wrap period);
            # a chunk goes fast only if every live group fits and its own
            # slice is covered. The LUT bounds satisfy lo' <= true lo and
            # hi' >= true hi, so fast-routed coverage is PROVEN, not
            # checked — the residual deficit summed below is 0 by
            # construction and only guards routing-logic regressions.
            fits_g = (
                (~has)
                | (bank.count[rows_b] <= band_r)
                | (hi_req <= lo_a + band_r)
            )
            has_chunk = jnp.any(has, axis=1)
            fits = jnp.all(fits_g, axis=1) & ~chunk_unc
            mode = jnp.where(
                has_chunk, jnp.where(fits, 2, 1), 0
            ).astype(jnp.int32)
            fast_cover_of = jnp.sum(
                jnp.where(
                    has & fits[:, None] & (bank.count[rows_b] > band_r),
                    jnp.maximum(hi_req - (lo_a + band_r), 0), 0,
                )
            )
            cover_overflow = chunk_cover_of + fast_cover_of
            occ_a12d, occ_of_pts = run(
                feats_b, (w0 // blk).astype(jnp.int32), row_of_chunk,
                lo_c.astype(jnp.int32),
                lo_a.reshape(-1).astype(jnp.int32),
                mode, bank.count.astype(jnp.int32),
                bank.data_t, bank.wide_t,
            )                                      # (3K, n_chunks * blk)
        else:
            lo = jnp.clip(lo_raw, 0, k_ext - w_pallas)
            lo = (lo // 128) * 128
            # a slice at least count wide covers one full wrap period =
            # every particle (duplicate copies carry identical x/y
            # properties), so only count > w_pallas can under-cover
            uncovered = bank.count[rows_b] > w_pallas
            cover_overflow = jnp.sum(
                jnp.where(
                    has & uncovered,
                    jnp.maximum(hi_req - (lo + w_pallas), 0), 0,
                )
            )
            occ_a12d, occ_of_pts = run(
                feats_b, (w0 // blk).astype(jnp.int32), row_of_chunk,
                lo.astype(jnp.int32), bank.count.astype(jnp.int32),
                bank.data_t, bank.wide_t,
                has=has.astype(jnp.int32),         # dead-window kernel gate
            )                                      # (n_chunks, 3K, blk)
        # occluder validity is derivable from the merged dist plane: the
        # kernel writes dist = _BIG (3e38) for empty top-k slots and real
        # ranges are < lidar_range. The kernel emits K-OUTER (3K, n2) — the
        # layout the downstream compaction gather wants — so no XLA
        # transpose copy (0.73 ms/step) is needed.
        occ_valid = (
            occ_a12d[2 * cfg.max_occluders :].reshape(
                cfg.max_occluders, n_chunks, blk
            ) < 1e37
        ) & valid_blk[None]
        occ_of = jnp.sum(jnp.where(valid_blk, occ_of_pts, 0))
        k_major = True
        rank_flat = rank_blk.reshape(-1)
    else:
        # --- XLA fallback: (channel, azimuth)-sorted (C, pch) slot layout,
        # materialized with one slot-index gather + one 5-row column gather
        # (column-major so the gather's minor dim stays at pch; a trailing
        # size-5 axis would pad to 128 lanes under TPU tiling) ---
        n_chunks = n_ch * blocks_per_ch
        assert n_chunks % grp == 0, (
            "chunk count must be divisible by chunk_group"
        )
        sorted_key, perm = jax.lax.sort(
            (sort_key, jnp.arange(n, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        bounds = jnp.searchsorted(
            sorted_key, 8.0 * jnp.arange(n_ch + 1, dtype=jnp.float32) - 4.0
        )
        start = bounds[:-1]
        count = bounds[1:] - bounds[:-1]
        channel_overflow = jnp.sum(jnp.maximum(count - pch, 0))

        src_rank = start[:, None] + jnp.arange(pch)[None, :]   # (C, pch)
        slot_valid = (
            jnp.arange(pch)[None, :] < jnp.minimum(count, pch)[:, None]
        )
        slot_orig = perm[jnp.clip(src_rank, 0, n - 1)]         # (C, pch)

        cols = jnp.stack(
            [xyz[:, 0], xyz[:, 1], xyz[:, 2], intensity, az], axis=0
        )                                                      # (5, n)
        s_cols = cols[:, slot_orig]                            # (5, C, pch)
        s_x, s_y, s_z = s_cols[0], s_cols[1], s_cols[2]
        s_int = s_cols[3]
        s_az = jnp.where(slot_valid, s_cols[4], jnp.nan)

        ch_of_chunk = jnp.repeat(jnp.arange(n_ch), blocks_per_ch)
        row_of_chunk = order[ch_of_chunk]
        az_blk = s_az.reshape(n_chunks, blk)
        valid_blk = slot_valid.reshape(n_chunks, blk)
        min_az = jnp.min(jnp.where(valid_blk, az_blk, jnp.inf), axis=1)
        max_az = jnp.max(jnp.where(valid_blk, az_blk, -jnp.inf), axis=1)
        lo_raw = _batched_searchsorted(
            bank.angle, row_of_chunk, min_az - delta, k_ext
        )
        hi_req = _batched_searchsorted(
            bank.angle, row_of_chunk, max_az + delta, k_ext
        )

        x_blk = s_x.reshape(n_chunks, blk)
        y_blk = s_y.reshape(n_chunks, blk)
        z_blk = s_z.reshape(n_chunks, blk)
        lo = jnp.clip(lo_raw, 0, max(k_ext - w_sl, 0))
        cover_overflow = jnp.sum(jnp.maximum(hi_req - (lo + w_sl), 0))

        def one_chunk(args):
            (xyz_b, valid_b, row, lo_b) = args
            sl = jax.lax.dynamic_slice(
                bank.data, (row, lo_b, jnp.int32(0)), (1, w_sl, 4)
            )[0]
            # wrap-pad dedup: extended bank entries repeat with period
            # count[row] (banks.py layout), so a seam-spanning slice wider
            # than the narrow count would hit the same particle twice (same
            # x,y under a +-2pi-shifted sort angle), inflating n_hit /
            # occluder_overflow and wasting top-k slots. Keep only the first
            # copy: slice-local offset < count.
            keep = jnp.arange(w_sl) < bank.count[row]
            sl = sl.at[:, 3].set(jnp.where(keep, sl[:, 3], 1e9))
            wide = bank.wide[row]                                  # (Wc, 4)
            cand = jnp.concatenate([sl, wide], axis=0)             # (C, 4)
            cand_b = jnp.broadcast_to(cand[None], (blk,) + cand.shape)
            a1, a2, dist_k, valid_k, of = _occluder_phase(xyz_b, cand_b, cfg)
            of = jnp.where(valid_b, of, 0)
            valid_k = valid_k & valid_b[:, None]
            return a1, a2, dist_k, valid_k, jnp.sum(of)

        xyz_blk = jnp.stack([x_blk, y_blk, z_blk], axis=-1)
        g = lambda a: a.reshape((n_chunks // grp, grp) + a.shape[1:])
        occ_a1, occ_a2, occ_dist, occ_valid, occ_of = jax.lax.map(
            lambda t: jax.vmap(one_chunk)(t),
            (g(xyz_blk), g(valid_blk), g(row_of_chunk), g(lo)),
        )
        k_major = False
    n2 = n_chunks * blk
    k_occ = cfg.max_occluders
    if k_major:
        # keep the kernel's K-outer (3K, n_chunks, blk) layout: a
        # point-major (n2, K) copy would pad the 24-lane minor dim to 128
        # (5.3x HBM waste at full n2 scale). Point-major slices are
        # produced only AFTER compaction, at cap scale.
        any_occ = jnp.any(occ_valid, axis=0).reshape(n2)
    else:
        occ_a1 = occ_a1.reshape(n2, k_occ)
        occ_a2 = occ_a2.reshape(n2, k_occ)
        occ_dist = occ_dist.reshape(n2, k_occ)
        occ_valid = occ_valid.reshape(n2, k_occ)
        any_occ = jnp.any(occ_valid, axis=1)

        def gather_c(arr, ci):
            return arr[ci]

    # --- phase B: compact points with >= 1 occluder ---
    # default capacity: a quarter of the slots, rounded UP to a pulse_chunk
    # multiple (the pallas chunk count n2 includes one extra window per
    # channel, so n2 // 4 alone need not divide evenly)
    cap = cfg.compact_capacity or _cap_from_slots(n2, cfg.pulse_chunk)
    assert cap % cfg.pulse_chunk == 0, (
        "compact_capacity must be divisible by pulse_chunk"
    )
    n_occluded = jnp.sum(any_occ)
    compact_overflow = jnp.maximum(n_occluded - cap, 0)
    # sort-based nonzero (the cumsum+scatter lowering of jnp.nonzero was
    # 4.1 ms/step at bench shapes vs 0.7 ms for one i32 sort). On the
    # pallas path the sort key is (occluder count, slot) instead of plain
    # slot order: the pulse kernel's sweep/bump trip counts are BLOCK
    # maxima, so count-homogeneous blocks stop a single rare 12-occluder
    # point from taxing all 511 neighbors. Any compaction order is valid
    # (phase C is per-point, phase D scatters back); the one
    # order-sensitive reduction (diff_sum) is restored to slot order
    # before summing so stats stay bit-identical to the window path.
    slot_iota = jnp.arange(n2, dtype=jnp.int32)
    count_bucketed = k_major and (k_occ + 1) * n2 < 2**31
    if k_major:
        # the sorted-order RANK of each slot rides the compaction sort as a
        # payload, so mapping compacted slots back to sorted rows needs no
        # extra gather
        if count_bucketed:
            n_occ_slot = jnp.sum(
                occ_valid, axis=0
            ).reshape(n2).astype(jnp.int32)
            big_key = jnp.iinfo(jnp.int32).max
            ckey = jnp.where(any_occ, n_occ_slot * n2 + slot_iota, big_key)
        else:
            big_key = n2
            ckey = jnp.where(any_occ, slot_iota, n2)
        skey, rank_sorted = jax.lax.sort(
            (ckey, rank_flat), num_keys=1, is_stable=True
        )
        if cap > n2:
            # tiny configs can round cap above n2; pad with the dead-slot
            # sentinel so the [:cap] slice (and the later (cap//pblk, pblk)
            # reshape) stays full-length instead of silently shortening
            skey = jnp.pad(skey, (0, cap - n2), constant_values=big_key)
            rank_sorted = jnp.pad(rank_sorted, (0, cap - n2))
        skey = skey[:cap]
        rank_ci = rank_sorted[:cap]
        if count_bucketed:
            cidx = jnp.where(skey == big_key, n2, skey % n2)
        else:
            cidx = skey
    else:
        cidx = jax.lax.sort(jnp.where(any_occ, slot_iota, n2))
        if cap > n2:
            cidx = jnp.pad(cidx, (0, cap - n2), constant_values=n2)
        cidx = cidx[:cap]
    c_ok = cidx < n2
    ci = jnp.clip(cidx, 0, n2 - 1)

    if k_major:
        # channel of chunk c is c // (blocks_per_ch + 1); slot i sits in
        # chunk i // blk — pure arithmetic, no LUT gather
        c_ch = (ci // blk) // (blocks_per_ch + 1)
        # ONE fused column gather for the five 1-row payloads (x, y, z,
        # intensity, bitcast sorted->orig permutation): separate 1-D gathers
        # of the same index vector cost ~1 ms EACH at bench shapes (small
        # gathers pay per-index overhead). The K-wide occluder planes stay
        # as separate gather_c calls — folding them into one (5+4K)-row
        # gather was MEASURED SLOWER (10.3 ms gather + 3.7 ms concat: wide
        # gathers pay per-cell instead).
        small = jnp.stack(
            [
                sx, sy, sz, si,
                jax.lax.bitcast_convert_type(sperm, jnp.float32),
            ],
            axis=0,
        )                                                  # (5, n_pad)
        rk = jnp.clip(rank_ci, 0, small.shape[1] - 1)
        gs = small[:, rk]                                  # (5, cap)
        c_xyz = jnp.stack([gs[0], gs[1], gs[2]], axis=-1)
        c_int = gs[3]
        c_orig = jax.lax.bitcast_convert_type(gs[4], jnp.int32)
        # ONE column gather of the merged (3K, n2) kernel output replaces
        # the former three separate K-plane gathers (~0.94 ms each at bench
        # shapes — small gathers pay per-index overhead, so one launch over
        # 3K rows costs ~one launch, not three)
        km = occ_a12d                          # already K-outer (3K, n2)
        # STAY K-outer at compact scale too: the former (cap, 3K)/(cap, K)
        # planes put K on the minor dim, which pads 5.3x under TPU (8, 128)
        # tiling — both as HBM temps (several 0.7 ms staging fusions per
        # step) and as VMEM tiles inside the pulse kernel (24 of 128 lanes
        # used by every sweep op). The pulse kernel consumes (K, cap).
        gm = km[:, ci]                                     # (3K, cap)
        c_a1 = gm[:k_occ]
        c_a2 = gm[k_occ : 2 * k_occ]
        c_rr = gm[2 * k_occ :]
        # validity is derivable from the gathered ranges: the kernel writes
        # dist = _BIG (3e38) for empty top-k slots and real ranges are
        # < lidar_range, so a valid K-plane gather is redundant. The
        # per-point valid_blk mask needs no re-apply here — compaction
        # (any_occ over the MASKED occ_valid) only admits valid points,
        # whose kernel dist column equals dist < _BIG exactly.
        c_occ_valid = (c_rr < 1e37) & c_ok[None, :]
    else:
        c_ch = ci // pch          # channel of slot i is i // pch (C, pch)
        valid_flat = slot_valid.reshape(n2)
        slot_to_orig = jnp.where(valid_flat, slot_orig.reshape(n2), n)
        c_xyz = jnp.stack(
            [s_x.reshape(n2)[ci], s_y.reshape(n2)[ci], s_z.reshape(n2)[ci]],
            axis=-1,
        )
        c_int = s_int.reshape(n2)[ci]
        c_orig = slot_to_orig[ci]
        c_occ_valid = gather_c(occ_valid, ci) & c_ok[:, None]

    # --- phase C: sweep + pulse re-simulation on the compacted set ---
    if use_pallas:
        from lidar_snow_sim_tpu.ops.pallas_pulse import make_pallas_pulse_phase

        ipm = float(cfg.intervals_per_meter)
        c_tau = SPEED_OF_LIGHT * cfg.tau_h
        # wide pulse blocks: the sweep is a 2K+2-step sequential walk of
        # small vectors, so per-iteration latency dominates — amortize it
        # over as many points as the scoped-VMEM budget allows
        pblk = next(
            (b for b in (cfg.pulse_block, 512, 256, 64) if cap % b == 0),
            64,
        )
        c_d = jnp.linalg.norm(c_xyz, axis=-1)
        c_right, c_left = beam_limits(
            c_xyz[:, 0], c_xyz[:, 1], cfg.beam_divergence_rad
        )
        # per-channel calib via one-hot matmul: four 64-entry LUT gathers at
        # cap scale were ~1 ms each; one (cap, 64) @ (64, 4) MXU matmul is
        # effectively free. HIGHEST precision is REQUIRED: the TPU default
        # bf16 multiplication would round focal_slope/focal_offset ~2^-9
        # relative (most hdl64 values are not bf16-representable) before the
        # decision tail, silently breaking dense==window bit-identity on
        # device; a one-hot @ LUT product at HIGHEST is exact.
        oh = (c_ch[:, None] == jnp.arange(n_ch)[None, :]).astype(jnp.float32)
        c_lut = jnp.matmul(
            oh,
            jnp.stack([min_int_lut, fs_lut, fo_lut, max_int_lut], axis=1),
            precision=jax.lax.Precision.HIGHEST,
        )                                                  # (cap, 4)
        c_min, c_fs, c_fo, c_max = (
            c_lut[:, 0], c_lut[:, 1], c_lut[:, 2], c_lut[:, 3]
        )
        feats = jnp.stack([c_d, c_right, c_left, 0.9 * c_max], axis=0)
        c_valid_f = c_occ_valid.astype(jnp.float32)        # (K, cap)
        # occluder properties stay SEPARATE K-OUTER (K, cap) planes: a
        # trailing K (or stacked size-5/2) axis would be the HBM minormost
        # dim and pad 5.3x/128x under (8, 128) tiling
        phase = (2.0 * jnp.pi / c_tau)
        all_r = jnp.concatenate([c_rr, c_d[None, :]], axis=0)  # (K+1, cap)
        cos_b = jnp.cos(phase * all_r)
        sin_b = jnp.sin(phase * all_r)
        gph = phase * range_grid
        run_pulse = make_pallas_pulse_phase(
            blk=pblk, k_occ=k_occ, beam_rad=cfg.beam_divergence_rad,
            ipm=ipm, c_tau=c_tau, xsi_r1=cfg.xsi_r1, xsi_r2=cfg.xsi_r2,
            interpret=cfg.pallas_interpret,
            pair=cfg.pulse_pair and (cap // pblk) % 2 == 0,
        )
        i_peak, peak_idx, touched_any, _rem = run_pulse(
            feats, c_a1, c_a2, c_rr, c_valid_f,
            cos_b, sin_b, jnp.cos(gph), jnp.sin(gph)
        )
        i_peak = i_peak.reshape(cap)
        peak_idx = peak_idx.reshape(cap)
        touched_any = touched_any.reshape(cap)

        # decision tail (simulation.py:151-192), elementwise in XLA
        # (c_min/c_fs/c_fo/c_max come from the one-hot LUT matmul above)
        d_max = peak_idx.astype(jnp.float32) / ipm - c_tau / 2
        i_max = i_peak + c_max * c_fs * jnp.abs(
            c_fo - (1 - d_max / cfg.lidar_range) ** 2
        )
        i_max = jnp.clip(i_max, c_min, c_max)
        attenuated = jnp.abs(d_max - c_d) < cfg.range_tolerance
        new_i = jnp.floor(i_max)
        lab = jnp.where(
            touched_any, jnp.where(attenuated, 1.0, 2.0), 0.0
        )
        scale_r = jnp.where(
            touched_any & ~attenuated, d_max / jnp.maximum(c_d, 1e-12), 1.0
        )
        nx = c_xyz * scale_r[:, None]
        ni = jnp.where(
            touched_any, jnp.clip(new_i, c_min, c_max), c_int
        )
        contrib = jnp.where(
            touched_any & attenuated & c_ok, 0.9 * c_max - new_i, 0.0
        )
        if count_bucketed:
            # compaction is count-ordered; re-sort the contributions to
            # ascending slot order so the f32 sum sees the exact array the
            # slot-ordered path would — bit-identical diff stats
            _, contrib = jax.lax.sort(
                (cidx, contrib), num_keys=1, is_stable=True
            )
        diff_c = jnp.sum(contrib)
        bump_of = jnp.int32(0)  # bumps == occluders: can never overflow
    else:
        def pulse_chunk_fn(args):
            (xyz_c, int_c, ok_c, a1_c, a2_c, d_c, v_c, mi, mx, fs, fo) = args
            return _pulse_phase(
                xyz_c, int_c, ok_c, a1_c, a2_c, d_c, v_c,
                mi, mx, fs, fo, range_grid, cfg,
            )

        pc_ = lambda a: a.reshape((cap // cfg.pulse_chunk, cfg.pulse_chunk)
                                  + a.shape[1:])
        (nx, ni, lab, diff_c, bump_of) = jax.lax.map(
            pulse_chunk_fn,
            (
                pc_(c_xyz), pc_(c_int), pc_(c_ok),
                pc_(gather_c(occ_a1, ci)), pc_(gather_c(occ_a2, ci)),
                pc_(gather_c(occ_dist, ci)),
                pc_(c_occ_valid),
                pc_(min_int_lut[c_ch]), pc_(max_int_lut[c_ch]),
                pc_(fs_lut[c_ch]), pc_(fo_lut[c_ch]),
            ),
        )
    nx = nx.reshape(cap, 3)
    ni = ni.reshape(cap)
    lab = lab.reshape(cap)

    # --- phase D: scatter compacted results to original order ---
    tgt = jnp.where(c_ok, c_orig, n)
    # in-bounds targets are distinct (ci indexes distinct valid slots and
    # slot_orig is injective on them; invalid entries collide only on the
    # dropped n sentinel), so the scatters can claim unique indices; the xyz
    # scatter goes plane-by-plane — a (cap, 3) update payload made XLA pick
    # a padded layout that cost 5.2 ms/step vs 2.8 for three 1-D scatters.
    # MEASURED NEGATIVE (round 3, BASELINE.md): replacing the five 1-D
    # scatters with ONE i32 inverse-map scatter + a fused (5, n) column
    # gather + selects benched 34.37 vs 30.31 ms/step — the wide gather
    # pays per-cell over n (not cap) columns, which exceeds the scatters.
    #
    # Touched-only compaction (round 4): an UNTOUCHED compacted point
    # scatters back bit-identical values — scale_r is exactly 1.0 (x * 1.0
    # preserves every f32 bit incl. -0.0), ni selects c_int (a bit-exact
    # copy of the input intensity), and lab is 0 (the packed default) — so
    # skipping it changes nothing. Only label == 2 points MOVE (need the
    # xyz scatters; label == 1 keeps xyz exactly: scale_r is 1.0 there
    # too) and only label > 0 points need the intensity+label scatter.
    # TPU scatter cost scales with the update count (near-serial), so one
    # tiny 2-operand segment sort + one fused 5-row gather buys ~4x fewer
    # scatter updates. Capacity misses are COUNTED into compact_overflow
    # (never silent) and grow with compact_capacity.
    lab_i = lab.astype(jnp.int32)
    packed_new = jnp.round(ni).astype(jnp.int32) * 4 + lab_i
    # auto caps from measured populations (BASELINE.md round-4: bench scan
    # at the heaviest rate touches ~66% of the compact capacity, but only
    # ~9.5% is label 2 — attenuation dominates, movement is rare)
    tcap = min(cfg.touch_capacity or max(3 * cap // 4, 256), cap)
    scap = min(cfg.scatter_capacity or max(cap // 4, 256), tcap)
    touch_overflow = jnp.int32(0)
    if tcap < cap:
        is_scat = c_ok & (lab_i == 2)
        is_touch = c_ok & (lab_i > 0)
        cap_i = jnp.int32(cap)
        seg = jnp.where(
            is_scat, 0,
            jnp.where(is_touch, cap_i,
                      jnp.where(c_ok, 2 * cap_i, 3 * cap_i)),
        )
        _, t_idx = jax.lax.sort(
            (seg, jnp.arange(cap, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        touch_overflow = (
            jnp.maximum(jnp.sum(is_scat) - scap, 0)
            + jnp.maximum(jnp.sum(is_touch) - tcap, 0)
        ).astype(jnp.int32)
        # ONE fused 5-row column gather (i32 rows ride bitcast — pure data
        # movement, no f32 canonicalization; same trick as the sperm
        # payload above). Rows: target, x, y, z, packed intensity+label.
        gstack = jnp.stack(
            [
                jax.lax.bitcast_convert_type(tgt, jnp.float32),
                nx[:, 0], nx[:, 1], nx[:, 2],
                jax.lax.bitcast_convert_type(packed_new, jnp.float32),
            ],
            axis=0,
        )                                                  # (5, cap)
        gt = gstack[:, t_idx[:tcap]]                       # (5, tcap)
        t_tgt = jax.lax.bitcast_convert_type(gt[0], jnp.int32)
        t_packed = jax.lax.bitcast_convert_type(gt[4], jnp.int32)
        # slots past the real touched count hold untouched (or dead) rows:
        # scattering them is benign — identical values (or a dropped n
        # sentinel target)
        new_xyz_planes = [
            xyz[:, i].at[t_tgt[:scap]].set(
                gt[1 + i][:scap], mode="drop", unique_indices=True
            )
            for i in range(3)
        ]
        scatter_tgt, scatter_val = t_tgt, t_packed
    else:
        new_xyz_planes = [
            xyz[:, i].at[tgt].set(nx[:, i], mode="drop", unique_indices=True)
            for i in range(3)
        ]
        scatter_tgt, scatter_val = tgt, packed_new
    # intensity+label ride ONE i32 scatter: the output intensity is
    # jnp.round()ed either way (simulation.py:516), so round(i) * 4 + label
    # is lossless (labels are {0,1,2}; two's-complement >>2 floors exactly
    # for negative rounded intensities too) and saves an n-sized scatter.
    packed0 = jnp.round(intensity).astype(jnp.int32) * 4
    packed = packed0.at[scatter_tgt].set(
        scatter_val, mode="drop", unique_indices=True,
    )
    new_int = (packed >> 2).astype(points.dtype)
    label = (packed & 3).astype(points.dtype)

    keep = mask & ((label == 2) | (new_int > noise_at))
    num_removed = jnp.sum(mask & ~keep).astype(jnp.int32)
    num_attenuated = jnp.sum(keep & (label == 1)).astype(jnp.int32)

    diff_sum = jnp.sum(diff_c)
    avg_diff = jnp.where(
        num_attenuated > 0,
        (diff_sum / jnp.maximum(num_attenuated, 1)).astype(jnp.int32),
        0,
    )

    out_planes = jnp.stack(new_xyz_planes + [new_int, label])
    return SnowfallResult(
        planes=out_planes,
        keep=keep,
        num_attenuated=num_attenuated,
        num_removed=num_removed,
        avg_intensity_diff=avg_diff,
        window_overflow=cover_overflow.astype(jnp.int32),
        occluder_overflow=jnp.sum(occ_of).astype(jnp.int32),
        bump_overflow=jnp.sum(bump_of).astype(jnp.int32),
        channel_overflow=channel_overflow.astype(jnp.int32),
        compact_overflow=(compact_overflow + touch_overflow).astype(
            jnp.int32
        ),
    )


def calib_device_arrays(calib: SensorCalib):
    """SensorCalib fields consumed by snowfall_augment, as a device tuple."""
    return (
        jnp.asarray(calib.min_intensity),
        jnp.asarray(calib.focal_distance),
        jnp.asarray(calib.focal_slope),
        jnp.asarray(calib.focal_offset),
        jnp.asarray(calib.max_intensity),
    )


@dataclasses.dataclass
class SnowfallAugmenter:
    """Host-facing convenience wrapper: pads, runs the jitted core, compacts.

    Mirrors the reference's `augment(pc, ...) -> (stats, aug_pc)` contract.
    """

    bank: object
    calib: SensorCalib
    cfg: SnowfallConfig = SnowfallConfig()
    seed: int = 0

    def __post_init__(self):
        self._fn = jax.jit(
            snowfall_augment, static_argnames=("cfg",)
        )
        self._calib_arrays = calib_device_arrays(self.calib)
        self._bank_dev = jax.device_put(self.bank)

    def _grow_for_overflow(self, name: str) -> bool:
        """Raise the capacity behind an overflow counter (dense assembly);
        returns False when nothing can grow further."""
        cfg = self.cfg
        k_ext = int(self.bank.angle.shape[1])
        if name == "window_overflow":
            if cfg.assembly != "dense":
                return False
            new = {}
            if cfg.band_width:
                nb = min(cfg.band_width * 2, (k_ext // 128) * 128)
                if nb > cfg.band_width:
                    new["band_width"] = nb
            if cfg.slice_width < k_ext:
                new["slice_width"] = min(cfg.slice_width * 2, k_ext)
            if not new:
                return False
        elif name == "occluder_overflow":
            new = dict(
                max_occluders=cfg.max_occluders * 2,
                max_bumps=max(cfg.max_bumps, cfg.max_occluders * 2),
            )
        elif name == "bump_overflow":
            new = dict(max_bumps=min(cfg.max_bumps * 2, cfg.max_occluders))
            if new["max_bumps"] == cfg.max_bumps:
                return False
        elif name == "channel_overflow":
            new = dict(channel_capacity=cfg.channel_capacity * 2)
        elif name == "compact_overflow":
            cap = cfg.compact_capacity or default_compact_capacity(
                cfg, self.calib.num_lasers
            )
            new = dict(compact_capacity=cap * 2)
            # explicit touch/scatter caps scale along (auto ones derive
            # from compact_capacity and grow for free)
            if cfg.touch_capacity:
                new["touch_capacity"] = min(cfg.touch_capacity * 2, cap * 2)
            if cfg.scatter_capacity:
                new["scatter_capacity"] = min(
                    cfg.scatter_capacity * 2, cap * 2
                )
        else:
            return False
        self.cfg = dataclasses.replace(cfg, **new)
        return True

    def __call__(self, pc, order=None, shuffle: bool = True):
        from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

        key = jax.random.PRNGKey(self.seed)
        if order is None:
            order = np.arange(self.calib.num_lasers)
            if shuffle:
                order = np.random.permutation(order)
        padded = pad_cloud(np.asarray(pc), self.cfg.max_points)
        args = (
            jnp.asarray(padded.points),
            jnp.asarray(padded.mask),
            self._bank_dev,
            self._calib_arrays,
            jnp.asarray(order, dtype=jnp.int32),
            key,
        )
        counters = (
            "window_overflow",
            "occluder_overflow",
            "bump_overflow",
            "channel_overflow",
            "compact_overflow",
        )
        # self-tuning capacities: overflow is counted, the offending
        # capacity doubles, and the scan reruns (a recompile) — results are
        # never silently truncated and configs never need hand-tuning
        for _attempt in range(8):
            res = jax.device_get(self._fn(*args, self.cfg))
            overflowed = [n for n in counters if int(getattr(res, n))]
            if not overflowed:
                break
            import logging

            grew = all(self._grow_for_overflow(n) for n in overflowed)
            logging.getLogger(__name__).warning(
                "snowfall capacities grew after %s: %s",
                {n: int(getattr(res, n)) for n in overflowed},
                {k: getattr(self.cfg, k) for k in (
                    "slice_width", "max_occluders", "max_bumps",
                    "channel_capacity", "compact_capacity")},
            )
            if not grew:
                raise RuntimeError(
                    f"capacity overflow not auto-resolvable: "
                    f"{[(n, int(getattr(res, n))) for n in overflowed]}"
                )
        else:
            raise RuntimeError(
                "capacity overflows persisted after growth: "
                f"{[(n, int(getattr(res, n))) for n in overflowed]}"
            )
        stats = (
            int(res.num_attenuated),
            int(res.num_removed),
            int(res.avg_intensity_diff),
        )
        # device output is plane-major (5, N); restore the reference's
        # (n, 5) row layout on the host (simulation.py:589-599)
        return stats, np.ascontiguousarray(res.planes.T[res.keep])
