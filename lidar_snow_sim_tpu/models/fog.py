"""Fog simulation — TPU-native equivalent of the `lib/LiDAR_fog_sim` surface.

The reference viewer consumes ``fog_simulation.ParameterSet`` and
``simulate_fog`` from the ICCV'21 "Fog Simulation on Real LiDAR Point Clouds
for 3D Object Detection" submodule, called exactly as

    p = ParameterSet(gamma=1e-6, gamma_min=1e-7, gamma_max=1e-5,
                     gamma_scale=1e7); p.beta_0 = p.gamma / np.pi
    pc, simulated_fog_pc, info_dict = simulate_fog(p, pc, noise=10,
                                                   gain=True,
                                                   noise_variant='v4')

(`pointcloud_viewer.py:52,274-279,2944-2951`), with
``info_dict = {min_fog_response, max_fog_response, num_fog_responses}``.
The submodule itself is not checked into the reference snapshot, so the
physics here follows the paper's radiometric model (the equations the
submodule implements); the call contract is matched exactly and the noise
variants are documented approximations (see PARITY.md).

Model (paper eq. 5-10, per point with measured intensity i at range r0):

- Hard channel: two-way extinction, ``i_hard = i * exp(-2 alpha r0)``.
- Soft channel: the fog volume back-scatters the pulse; its time-resolved
  response is the pulse-shape convolution

      S(R) = beta * INT sin^2(pi xi/(c tau_H)) * xi_overlap(r) *
             e^{-2 alpha r} / r^2 dr

  precomputed once on the quantized range grid (fixed shapes). The sensor's
  intensity calibration maps a beta_0 = gamma/pi reflectivity target to its
  count value, so the fog response in counts is ``i_soft =
  prefixmax(S)(r0) / beta_0`` — target-independent, truncated to ranges
  BEFORE the target (nearer targets see less of the fog column), and
  inversely scaled by the viewer's gamma knob.
- A point whose ``i_soft > i_hard`` is replaced by a fog return at the
  prefix-argmax range (plus measurement noise, variant-dependent), label 2;
  survivors keep their geometry with the attenuated intensity.
- ``gain=True`` rescales the augmented cloud's intensities to a 255 peak.

Standard fog relations: MOR = ln(20)/alpha, beta = 0.046/MOR.
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
    """Fog + sensor parameters (hashable; jit-static).

    alpha: extinction coefficient [1/m]. MOR and beta derive from it unless
    beta is given explicitly; beta_0 derives from gamma unless given.
    """

    alpha: float = 0.06
    beta: float | None = None
    # differential reflectivity calibration (viewer: gamma=1e-6 and
    # beta_0 = gamma/pi, `pointcloud_viewer.py:274-279`)
    gamma: float = 1e-6
    beta_0: float | None = None
    # sensor model (HDL-64E-like, matching the snowfall engine's constants)
    tau_h: float = 1e-8          # pulse width [s]
    lidar_range: float = 120.0
    intervals_per_meter: int = 10
    xsi_r1: float = 0.9          # receiver overlap ramp (simulation.py:553)
    xsi_r2: float = 1.0
    # measurement noise on the fog-return range (see simulate_fog)
    noise: float = 10.0
    noise_variant: str = "v4"

    @property
    def mor(self) -> float:
        """Meteorological optical range [m]."""
        return math.log(20.0) / self.alpha

    @property
    def beta_eff(self) -> float:
        return self.beta if self.beta is not None else 0.046 / self.mor

    @property
    def beta_0_eff(self) -> float:
        return self.beta_0 if self.beta_0 is not None else self.gamma / math.pi

    @property
    def num_bins(self) -> int:
        m = self.lidar_range * self.intervals_per_meter
        return int(
            np.ceil(m + SPEED_OF_LIGHT * self.tau_h * self.intervals_per_meter)
        )


class ParameterSet:
    """Mutable kwargs-style parameter bag mirroring the submodule's
    ``ParameterSet`` construction pattern (`pointcloud_viewer.py:274-279`):
    any keyword becomes an attribute, and derived attributes (mor, beta,
    beta_0) may be overwritten after construction, exactly like the viewer's
    ``p.beta_0 = p.gamma / np.pi``."""

    def __init__(self, **kwargs):
        self.alpha = 0.06
        self.alpha_min = 0.003
        self.alpha_max = 0.5
        self.alpha_scale = 1000
        self.gamma = 1e-6
        self.gamma_min = 1e-7
        self.gamma_max = 1e-5
        self.gamma_scale = 1e7
        self.mor = math.log(20.0) / self.alpha
        self.beta = 0.046 / self.mor
        self.beta_0 = self.gamma / math.pi
        self.tau_h = 1e-8
        self.lidar_range = 120.0
        self.intervals_per_meter = 10
        self.xsi_r1 = 0.9
        self.xsi_r2 = 1.0
        for k, v in kwargs.items():
            setattr(self, k, v)
        # re-derive when alpha/gamma came in via kwargs without overrides
        if "alpha" in kwargs and "mor" not in kwargs:
            self.mor = math.log(20.0) / self.alpha
        if "alpha" in kwargs and "beta" not in kwargs:
            self.beta = 0.046 / self.mor
        if "gamma" in kwargs and "beta_0" not in kwargs:
            self.beta_0 = self.gamma / math.pi

    def frozen(self, noise: float = 10.0,
               noise_variant: str = "v4") -> FogParameterSet:
        return FogParameterSet(
            alpha=self.alpha, beta=self.beta, gamma=self.gamma,
            beta_0=self.beta_0, tau_h=self.tau_h,
            lidar_range=self.lidar_range,
            intervals_per_meter=self.intervals_per_meter,
            xsi_r1=self.xsi_r1, xsi_r2=self.xsi_r2,
            noise=noise, noise_variant=noise_variant,
        )


class FogResult(NamedTuple):
    points: jax.Array       # (N, 5) augmented; label col: 0 kept, 2 fog
    keep: jax.Array         # (N,) valid input points (none removed)
    num_scattered: jax.Array
    num_attenuated: jax.Array
    num_removed: jax.Array
    min_fog_response: jax.Array   # over replaced points, intensity scale
    max_fog_response: jax.Array
    soft_response: jax.Array  # (bins,) shared fog response curve (diagnostic)


def _xsi(r, r1, r2):
    return jnp.clip((r - r1) / (r2 - r1), 0.0, 1.0)


def soft_response_curve(p: FogParameterSet):
    """Fog soft-channel response on the quantized range grid (jittable).

    Returns (grid_ranges, response); response = beta * C(R) with C the
    pulse-convolution integral, i.e. the fog return of a unit-CA_P0 target.
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


def fog_augment(p: FogParameterSet, points, mask, key):
    """Jittable fog augmentation of a padded (N, 5) scan.

    Per-point hard vs soft channel competition (module docstring); returns
    the augmented cloud (same shape, label column rewritten) plus the
    info-dict counters. No points are removed (the submodule keeps all).
    """
    xyz = points[:, :3]
    intensity = points[:, 3]
    d = jnp.linalg.norm(xyz, axis=-1)
    d_safe = jnp.maximum(d, 1e-6)
    ipm = p.intervals_per_meter

    r_grid, soft = soft_response_curve(p)
    # running max/argmax: the best fog return at ranges BEFORE the target
    def scanf(carry, x):
        best, bidx, i = carry
        take = x > best
        carry = (
            jnp.where(take, x, best),
            jnp.where(take, i, bidx),
            i + 1,
        )
        return carry, (carry[0], carry[1])

    _, (pmax, pargmax) = jax.lax.scan(
        scanf, (jnp.float32(-1.0), jnp.int32(0), jnp.int32(0)), soft
    )

    idx = jnp.clip((d_safe * ipm).astype(jnp.int32), 0, soft.shape[0] - 1)
    # Per-point soft response (power units): the best fog return at ranges
    # before the target. Nearer targets see less of the fog column.
    p_soft = pmax[idx]
    r_fog = pargmax[idx].astype(jnp.float32) / ipm

    # Hard response in the same power units: the target's differential
    # reflectivity comes from its measured intensity through the gamma
    # calibration, normalized so the viewer default gamma = 1e-6 maps
    # i = 255 to a perfect Lambertian target (beta_0_i = (i/255)/pi). The
    # viewer's gamma slider then scales targets against the fog linearly:
    # larger gamma -> brighter calibration -> fewer fog replacements.
    gamma_rel = p.gamma / 1e-6
    beta_0_i = (intensity / 255.0) * gamma_rel / jnp.pi
    p_hard = (
        beta_0_i
        * _xsi(d_safe, p.xsi_r1, p.xsi_r2)
        * jnp.exp(-2.0 * p.alpha * d_safe)
        / d_safe**2
    )
    fogged = mask & (p_soft > p_hard) & (d > 1e-3)
    i_soft = p_soft  # power-unit response, reported in the info dict

    # measurement noise on the fog range. The submodule's exact variants are
    # not reproducible without its source (PARITY.md); these implement the
    # documented intent: v1/v2 absolute (uniform/gaussian) at `noise` tenth-
    # bins, v3/v4 the same scaled by r_fog / MOR (far fog = noisier).
    amp = p.noise / ipm
    u = jax.random.uniform(key, d.shape, minval=-1.0, maxval=1.0)
    g = jax.random.normal(jax.random.fold_in(key, 1), d.shape)
    rel = r_fog / p.mor
    noise_r = {
        "v1": amp * u,
        "v2": amp * g,
        "v3": amp * u * rel,
        "v4": amp * g * rel,
    }[p.noise_variant]
    r_new = jnp.clip(r_fog + noise_r, 0.3, p.lidar_range)

    scale = jnp.where(fogged, r_new / d_safe, 1.0)
    new_xyz = xyz * scale[:, None]
    # fog-return counts: the soft power pushed back through the inverse of
    # the same intensity calibration at the return's apparent range
    i_fog = jnp.clip(
        255.0 * jnp.pi * p_soft * r_new**2
        / (gamma_rel * jnp.maximum(_xsi(r_new, p.xsi_r1, p.xsi_r2), 0.05)),
        0.0, 255.0,
    )
    i_att = intensity * jnp.exp(-2.0 * p.alpha * d_safe)
    new_i = jnp.where(fogged, i_fog, i_att)

    label = jnp.where(fogged, 2.0, 0.0)
    out = jnp.concatenate(
        [new_xyz, new_i[:, None], label[:, None]], axis=1
    )
    resp = jnp.where(fogged, i_soft, jnp.nan)
    return FogResult(
        points=out,
        keep=mask,
        num_scattered=jnp.sum(fogged).astype(jnp.int32),
        num_attenuated=jnp.sum(
            mask & ~fogged & (new_i < intensity)
        ).astype(jnp.int32),
        num_removed=jnp.int32(0),
        min_fog_response=jnp.nanmin(resp),
        max_fog_response=jnp.nanmax(resp),
        soft_response=soft,
    )


class FogAugmenter:
    """Host-facing wrapper; returns (augmented cloud, stats dict)."""

    def __init__(self, params: FogParameterSet | None = None, seed: int = 0):
        self.params = params or FogParameterSet()
        self.seed = seed
        self._fn = jax.jit(fog_augment, static_argnames=("p",))

    def run(self, pc: np.ndarray):
        from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

        n = pc.shape[0]
        cap = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
        padded = pad_cloud(np.asarray(pc), cap)
        res = jax.device_get(
            self._fn(
                self.params,
                jnp.asarray(padded.points),
                jnp.asarray(padded.mask),
                jax.random.PRNGKey(self.seed),
            )
        )
        return res

    def __call__(self, pc: np.ndarray):
        res = self.run(pc)
        stats = {
            "num_scattered": int(res.num_scattered),
            "num_attenuated": int(res.num_attenuated),
            "num_removed": int(res.num_removed),
        }
        return res.points[res.keep], stats


def simulate_fog(p, pc: np.ndarray, noise: float, gain: bool = False,
                 noise_variant: str = "v1", seed: int = 0):
    """EXACT reference call contract (`pointcloud_viewer.py:2944-2951`):

        pc, simulated_fog_pc, info_dict = simulate_fog(p, pc, noise, gain,
                                                       noise_variant)

    p is a ParameterSet (mutable shim) or FogParameterSet; returns the
    augmented (N, >=5) cloud (all rows kept, label column rewritten), the
    fog-scattered subset, and info_dict with the reference's keys
    min_fog_response / max_fog_response / num_fog_responses (-inf/0 style
    sentinels replaced by the reference's "no responses" convention).
    """
    if isinstance(p, ParameterSet):
        fp = p.frozen(noise=noise, noise_variant=noise_variant)
    else:
        fp = dataclasses.replace(
            p, noise=noise, noise_variant=noise_variant
        )
    res = FogAugmenter(fp, seed=seed).run(np.asarray(pc))
    aug = res.points[res.keep]
    num = int(res.num_scattered)
    if gain and len(aug):
        peak = float(aug[:, 3].max())
        if peak > 0:
            aug = aug.copy()
            aug[:, 3] *= 255.0 / peak
    fog_pc = aug[aug[:, 4] == 2.0]
    info = {
        "min_fog_response": float(res.min_fog_response) if num else np.inf,
        "max_fog_response": float(res.max_fog_response) if num else 0.0,
        "num_fog_responses": num,
    }
    return aug, fog_pc, info


def simulate_fog_pc(p: FogParameterSet, pc: np.ndarray, noise: float = 10.0,
                    seed: int = 0):
    """Back-compat alias of `simulate_fog` returning stats-dict style info."""
    fp = dataclasses.replace(p, noise=noise)
    res = FogAugmenter(fp, seed=seed).run(np.asarray(pc))
    aug = res.points[res.keep]
    stats = {
        "num_scattered": int(res.num_scattered),
        "num_attenuated": int(res.num_attenuated),
        "num_removed": int(res.num_removed),
    }
    return aug, aug[aug[:, 4] == 2.0], stats
