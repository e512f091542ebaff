"""Fog simulation — TPU-native equivalent of the `lib/LiDAR_fog_sim` surface.

The reference viewer consumes ``fog_simulation.ParameterSet`` and
``simulate_fog`` from the ICCV'21 "Fog Simulation on Real LiDAR Point Clouds"
submodule (`pointcloud_viewer.py:52-55,2939-2956`; the submodule is not checked
in). This module re-derives the same physics as one fused jittable kernel:

Hard-target channel: the received power of the original return is attenuated
by two-way extinction through fog, ``P_hard ∝ i · exp(-2 α d)``.

Soft-target channel: the fog volume itself back-scatters the pulse. Its
time-resolved response is the pulse-shape convolution

    P_soft(R) = C_A · β · ∫ sin²(π ξ /(c τ_H)) · ξ_overlap(r) · e^{-2αr} / r² dr

evaluated once per scan on a fixed range grid (a single (bins, taps) windowed
reduction — fixed shapes, no data-dependent control flow). Points whose
soft-channel peak exceeds their attenuated hard return are replaced by a fog
return at the soft-peak range (jittered per point), label 2; survivors keep
their geometry with the attenuated intensity.

Standard fog relations used (paper/submodule convention):
MOR = ln(20)/α, β = 0.046/MOR.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_snow_sim_tpu.config import SPEED_OF_LIGHT


@dataclasses.dataclass(frozen=True)
class FogParameterSet:
    """Fog + sensor parameters (mirrors the submodule's ParameterSet knobs).

    alpha: extinction coefficient [1/m]. MOR and beta derive from it unless
    beta is given explicitly.
    """

    alpha: float = 0.06
    beta: float | None = None
    # sensor model (HDL-64E-like, matching the snowfall engine's constants)
    tau_h: float = 1e-8          # pulse width [s]
    lidar_range: float = 120.0
    intervals_per_meter: int = 10
    beta_0: float = 1e-6 / math.pi  # hard-target differential reflectivity
    xsi_r1: float = 0.9          # receiver overlap ramp (simulation.py:553)
    xsi_r2: float = 1.0
    # fog-return randomization
    range_jitter: float = 0.3    # +/- m uniform jitter on the soft-peak range
    intensity_jitter: float = 0.1
    noise: float = 10.0          # detection threshold on the intensity scale
    fog_reflectivity: float = 0.9  # intensity scale assigned to fog returns

    @property
    def mor(self) -> float:
        """Meteorological optical range [m]."""
        return math.log(20.0) / self.alpha

    @property
    def beta_eff(self) -> float:
        return self.beta if self.beta is not None else 0.046 / self.mor

    @property
    def num_bins(self) -> int:
        m = self.lidar_range * self.intervals_per_meter
        return int(
            np.ceil(m + SPEED_OF_LIGHT * self.tau_h * self.intervals_per_meter)
        )


class FogResult(NamedTuple):
    points: jax.Array       # (N, 5) augmented; label col: 0 kept, 2 fog
    keep: jax.Array         # (N,) survives detection threshold
    num_scattered: jax.Array
    num_attenuated: jax.Array
    num_removed: jax.Array
    soft_response: jax.Array  # (bins,) shared fog response curve (diagnostic)


def _xsi(r, r1, r2):
    return jnp.clip((r - r1) / (r2 - r1), 0.0, 1.0)


def soft_response_curve(p: FogParameterSet):
    """Fog soft-channel response on the quantized range grid (jittable).

    Returns (grid_ranges, response) — response is normalized to the same
    C_A·P_0 scale as the hard channel so the two are directly comparable.
    """
    ipm = p.intervals_per_meter
    c_tau = SPEED_OF_LIGHT * p.tau_h
    bins = p.num_bins
    r_grid = jnp.arange(bins, dtype=jnp.float32) / ipm
    taps = int(np.floor(c_tau * ipm)) + 1  # pulse support in bins

    # integrate the pulse over its support ending at each grid range
    dr = 1.0 / ipm
    offsets = jnp.arange(taps, dtype=jnp.float32) / ipm          # (T,)
    r = r_grid[:, None] - offsets[None, :]                        # (bins, T)
    valid = r > 1e-3
    rs = jnp.where(valid, r, 1.0)
    pulse = jnp.sin(jnp.pi * (r_grid[:, None] - rs) / c_tau) ** 2
    integrand = (
        pulse
        * _xsi(rs, p.xsi_r1, p.xsi_r2)
        * jnp.exp(-2.0 * p.alpha * rs)
        / rs**2
    )
    resp = jnp.sum(jnp.where(valid, integrand, 0.0), axis=1) * dr
    return r_grid, p.beta_eff * resp


def simulate_fog(p: FogParameterSet, points, mask, key):
    """Jittable fog augmentation of a padded (N, 5) scan.

    Mirrors the submodule's ``simulate_fog(ParameterSet, pc, noise)`` contract:
    returns the augmented cloud (same shape, label column rewritten), plus
    counters. Compact with ``points[keep]`` on host.
    """
    xyz = points[:, :3]
    intensity = points[:, 3]
    d = jnp.linalg.norm(xyz, axis=-1)
    d_safe = jnp.maximum(d, 1e-6)

    r_grid, soft = soft_response_curve(p)
    peak_idx = jnp.argmax(soft)
    soft_peak = soft[peak_idx]
    r_fog = r_grid[peak_idx]

    # hard channel on the same C_A·P_0-normalized scale as the soft curve:
    # the target's differential reflectivity is (i/255)/π sr⁻¹ (Lambertian,
    # intensity-calibrated), attenuated two-way and range-normalized.
    hard = (
        (intensity / 255.0)
        / jnp.pi
        * _xsi(d_safe, p.xsi_r1, p.xsi_r2)
        * jnp.exp(-2.0 * p.alpha * d_safe)
        / d_safe**2
    )
    # only points beyond the fog peak can be occluded by it
    fogged = mask & (soft_peak > hard) & (d > r_fog)

    k1, k2 = jax.random.split(key)
    jit_r = jax.random.uniform(
        k1, d.shape, minval=-p.range_jitter, maxval=p.range_jitter
    )
    jit_i = jax.random.uniform(
        k2, d.shape, minval=-p.intensity_jitter, maxval=p.intensity_jitter
    )
    r_new = jnp.clip(r_fog + jit_r, 0.5, p.lidar_range)
    scale = jnp.where(fogged, r_new / d_safe, 1.0)
    new_xyz = xyz * scale[:, None]

    i_att = intensity * jnp.exp(-2.0 * p.alpha * d_safe)
    # fog-return intensity: the soft channel's share of the total response,
    # on the fog reflectivity scale, with per-point jitter
    i_fog = jnp.clip(
        255.0
        * p.fog_reflectivity
        * (soft_peak / (soft_peak + hard + 1e-12))
        * (1.0 + jit_i),
        0.0,
        255.0,
    )
    new_i = jnp.where(fogged, i_fog, i_att)

    keep = mask & (new_i > p.noise)
    label = jnp.where(fogged, 2.0, 0.0)
    out = jnp.concatenate(
        [new_xyz, new_i[:, None], label[:, None]], axis=1
    )
    num_scattered = jnp.sum(keep & fogged).astype(jnp.int32)
    num_attenuated = jnp.sum(keep & ~fogged & (new_i < intensity)).astype(
        jnp.int32
    )
    num_removed = jnp.sum(mask & ~keep).astype(jnp.int32)
    return FogResult(
        points=out,
        keep=keep,
        num_scattered=num_scattered,
        num_attenuated=num_attenuated,
        num_removed=num_removed,
        soft_response=soft,
    )


def simulate_fog_pc(p: FogParameterSet, pc: np.ndarray, noise: float = 10.0,
                    seed: int = 0):
    """Host-facing call matching the submodule's ``simulate_fog(p, pc,
    noise)`` argument order (`pointcloud_viewer.py:2944`): returns
    (augmented cloud, fog-scattered points, info dict)."""
    aug, stats = FogAugmenter(
        dataclasses.replace(p, noise=noise), seed=seed
    )(pc)
    return aug, aug[aug[:, 4] == 2.0], stats


class FogAugmenter:
    """Host-facing wrapper mirroring ``simulate_fog(p, pc, noise)``."""

    def __init__(self, params: FogParameterSet | None = None, seed: int = 0):
        self.params = params or FogParameterSet()
        self.seed = seed
        self._fn = jax.jit(simulate_fog, static_argnames=("p",))

    def __call__(self, pc: np.ndarray):
        from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

        n = pc.shape[0]
        cap = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
        padded = pad_cloud(np.asarray(pc), cap)
        res = self._fn(
            self.params,
            jnp.asarray(padded.points),
            jnp.asarray(padded.mask),
            jax.random.PRNGKey(self.seed),
        )
        res = jax.device_get(res)
        stats = {
            "num_scattered": int(res.num_scattered),
            "num_attenuated": int(res.num_attenuated),
            "num_removed": int(res.num_removed),
        }
        return res.points[res.keep], stats
