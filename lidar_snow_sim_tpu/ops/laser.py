"""Laser output-power and adaptive-noise-floor estimation (device).

Port of the reference estimator (`tools/wet_ground/augmentation.py:195-266`):
intensities are normalized by cos(incident angle); relative output power is a
linear (or degree-2) fit vs distance scaled by `power_factor`; the noise floor
comes from a (50 x 2555) 2-D histogram of (distance, normalized intensity)
over range (10, 70) x (5, max): per distance row, the intensity-bin with the
minimal count (empty bins pre-filled with the total point count), rows whose
bin edge exceeds 5 fitted with linregress (or RANSAC polyfit), scaled by
`noise_floor`.

Histogram counting sorts the flattened bin ids and derives run lengths with
a suffix-min scan (a scatter-add histogram was 3x slower on TPU); the
row-minimum picks the lowest index among ties, the pinned substitute for the
reference's introselect-dependent np.argpartition (see oracle package
docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lidar_snow_sim_tpu.ops.fitting import (
    masked_linregress,
    masked_polyfit2,
    polyval2,
)

_X_BINS = 50
_Y_BINS = 2555
_D_LO, _D_HI = 10.0, 70.0
_Y_LO = 5.0


def _bin_index(v, lo, hi, nbins):
    """np.histogram2d bin index: [lo, hi) uniform bins, hi inclusive in the
    last bin; returns (idx, in_range)."""
    scaled = (v - lo) / (hi - lo) * nbins
    idx = jnp.floor(scaled).astype(jnp.int32)
    idx = jnp.where(v == hi, nbins - 1, idx)
    in_range = (v >= lo) & (v <= hi)
    return jnp.clip(idx, 0, nbins - 1), in_range


def noise_floor_rows(distance, norm_int, mask):
    """Per-distance-row minimal-count intensity estimate.

    Returns (x_centers (50,), min_vals (50,), row_valid (50,)) where row_valid
    applies the reference's min_vals > 5 filter.
    """
    n_points = jnp.sum(mask)  # len(pointcloud_planes) in the reference
    y_hi = jnp.abs(jnp.max(jnp.where(mask, norm_int, -jnp.inf)))

    xi, x_ok = _bin_index(distance, _D_LO, _D_HI, _X_BINS)
    yi, y_ok = _bin_index(norm_int, _Y_LO, y_hi, _Y_BINS)
    ok = mask & x_ok & y_ok

    # Sorted run-length counting instead of materializing the 50x2555
    # histogram via scatter-add (4.6 ms/step at bench shapes; this
    # sort + suffix-min-scan form is 1.4 ms). Per row the result is
    # argmin(hist) with empty bins pre-filled by n_points: a populated bin's
    # count never exceeds n_points, so the fill wins only on ties — where
    # argmin returns the first bin, index 0 (handled below).
    sentinel = _X_BINS * _Y_BINS
    flat = jnp.where(ok, xi * _Y_BINS + yi, sentinel)
    n = flat.shape[0]
    s = jax.lax.sort(flat)
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    start_pos = jnp.where(is_start, iota, n)
    suf_min = jax.lax.associative_scan(jnp.minimum, start_pos, reverse=True)
    nxt = jnp.concatenate([suf_min[1:], jnp.full((1,), n, jnp.int32)])
    cnt = nxt - iota                       # run length, valid at run starts
    valid = is_start & (s < sentinel)
    big = jnp.iinfo(jnp.int32).max
    row_of = s // _Y_BINS
    ybin_of = s % _Y_BINS
    rows = jnp.arange(_X_BINS, dtype=jnp.int32)
    in_row = (row_of[None, :] == rows[:, None]) & valid[None, :]  # (50, n)
    cnt_b = jnp.broadcast_to(cnt[None, :], in_row.shape)
    cmin = jnp.min(jnp.where(in_row, cnt_b, big), axis=1)         # (50,)
    ymin_at_cmin = jnp.min(
        jnp.where(
            in_row & (cnt_b == cmin[:, None]), ybin_of[None, :], big
        ),
        axis=1,
    )
    # empty row, or min count tying the n_points fill -> argmin lands on
    # the first (filled) bin, index 0
    ymins = jnp.where(
        (cmin == big) | (cmin >= n_points), 0, ymin_at_cmin
    )

    yedge = _Y_LO + ymins.astype(jnp.float32) * (y_hi - _Y_LO) / _Y_BINS
    xedges = jnp.linspace(_D_LO, _D_HI, _X_BINS + 1)
    x_centers = (xedges[:-1] + xedges[1:]) * 0.5
    return x_centers, yedge, yedge > _Y_LO


def estimate_laser_parameters(
    ground_xyz,
    ground_intensity,
    incident_angle,
    mask,
    power_factor: float = 15.0,
    noise_floor: float = 0.7,
    estimation_method: str = "linear",
):
    """Relative output power + adaptive noise threshold per ground point.

    All arrays are full-capacity with `mask` marking ground points. Returns
    (relative_output, threshold) evaluated at every masked point (garbage
    elsewhere).
    """
    norm_int = ground_intensity / jnp.cos(incident_angle)
    distance = jnp.linalg.norm(ground_xyz, axis=-1)

    if estimation_method == "linear":
        slope, intercept = masked_linregress(distance, norm_int, mask)
        p_power = jnp.stack([jnp.zeros_like(slope), slope, intercept])
    elif estimation_method == "poly":
        p_power = masked_polyfit2(distance, norm_int, mask)
    else:
        raise ValueError(estimation_method)
    relative_output = power_factor * polyval2(p_power, distance)

    x, min_vals, row_ok = noise_floor_rows(distance, norm_int, mask)

    if estimation_method == "poly":
        p_rows = masked_polyfit2(x, min_vals, row_ok)
    else:
        s, i = masked_linregress(x, min_vals, row_ok)
        p_rows = jnp.stack([jnp.zeros_like(s), s, i])
    # reference fallback: reuse the power fit when <= 3 usable rows
    p_min = jnp.where(jnp.sum(row_ok) > 3, p_rows, p_power)

    threshold = noise_floor * polyval2(p_min, distance)
    return relative_output, threshold
