"""Laser output-power and adaptive-noise-floor estimation (device).

Port of the reference estimator (`tools/wet_ground/augmentation.py:195-266`):
intensities are normalized by cos(incident angle); relative output power is a
linear (or degree-2) fit vs distance scaled by `power_factor`; the noise floor
comes from a (50 x 2555) 2-D histogram of (distance, normalized intensity)
over range (10, 70) x (5, max): per distance row, the intensity-bin with the
minimal count (empty bins pre-filled with the total point count), rows whose
bin edge exceeds 5 fitted with linregress (or RANSAC polyfit), scaled by
`noise_floor`.

Histogram counting uses one-hot bucketing + segment-sum (no scatter); the
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

    flat = jnp.where(ok, xi * _Y_BINS + yi, _X_BINS * _Y_BINS)
    hist = jax.ops.segment_sum(
        jnp.ones_like(flat, dtype=jnp.float32),
        flat,
        num_segments=_X_BINS * _Y_BINS + 1,
    )[:-1].reshape(_X_BINS, _Y_BINS)

    hist = jnp.where(hist == 0, n_points.astype(jnp.float32), hist)
    ymins = jnp.argmin(hist, axis=1)                       # first min per row

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
