"""Received-pulse re-simulation on the reference's quantized range grid.

Per beam, every occluding snowflake (and the partially-occluded hard target)
deposits a sin^2 pulse over the ~30 grid bins spanning one pulse width c*tau_h
(simulation.py:137-149,547-551); the augmented return is the argmax of the
summed waveform (simulation.py:151-156).

TPU formulation: instead of scatter-adds into a 1230-bin buffer, each bump is
evaluated *densely* over the whole grid with an integer-bin window mask and
accumulated — a pure broadcast/FMA pattern the VPU executes without gathers.
The window mask [ceil(10 r) <= m <= floor(10 (r + c tau))] is evaluated as
[m >= 10 r] & [m <= 10 (r + c tau)], exact for integer m.

All bumps share the amplitude scale 0.9 * max_intensity (the reference's
CA_P0 carry-over — see oracle/snowfall.py docstring), so amplitude
amp_b = 0.9 * max_intensity * ratio_b * xsi(r_b) / r_b^2 is computed by the
caller; this kernel only sums bumps and finds the peak.
"""

from __future__ import annotations

import jax.numpy as jnp

from lidar_snow_sim_tpu.config import SPEED_OF_LIGHT


def xsi(r, r1: float = 0.9, r2: float = 1.0):
    """Transmitter/receiver overlap ramp (simulation.py:553-569)."""
    return jnp.clip((r - r1) / (r2 - r1), 0.0, 1.0)


def waveform_peak(
    bump_r,
    bump_amp,
    range_grid,
    intervals_per_meter: int = 10,
    tau_h: float = 1e-8,
):
    """Sum the bump waveforms and locate the peak for one beam.

    Args:
      bump_r:    (B,) bump start ranges (m); invalid bumps: amp == 0
      bump_amp:  (B,) bump amplitudes (already includes ratio, xsi, 1/r^2)
      range_grid: (M,) the quantized grid R (config.SnowfallConfig.range_grid)

    Returns:
      (peak value, peak bin index) — ties resolve to the first index, like
      np.argmax.

    sin^2(pi (R - r)/ctau) is evaluated via the angle-addition identity
    sin^2(x) = (1 - cos(2x))/2 with cos/sin of the GRID phase precomputed
    once: per (bump, bin) that is 3 FMAs instead of a transcendental —
    the VPU cost drops ~10x; accuracy stays at f32 roundoff.
    """
    m = range_grid.shape[0]
    c_tau = SPEED_OF_LIGHT * tau_h
    bins = jnp.arange(m, dtype=jnp.float32)

    # grid-phase tables: cos/sin(2 pi R / ctau), shared by every bump
    gphase = (2.0 * jnp.pi / c_tau) * range_grid
    cos_g = jnp.cos(gphase)
    sin_g = jnp.sin(gphase)

    wave = jnp.zeros_like(range_grid)
    for b in range(bump_r.shape[0]):
        r = bump_r[b]
        window = (bins >= r * intervals_per_meter) & (
            bins <= (r + c_tau) * intervals_per_meter
        )
        beta = (2.0 * jnp.pi / c_tau) * r
        # cos(2 pi (R - r)/ctau) = cos_g cos(beta) + sin_g sin(beta)
        pulse = 0.5 * (1.0 - (cos_g * jnp.cos(beta) + sin_g * jnp.sin(beta)))
        wave = wave + jnp.where(window, bump_amp[b] * pulse, 0.0)

    idx = jnp.argmax(wave)
    return wave[idx], idx
