"""STF-style foggification — equivalent of the SeeingThroughFog fog surface.

The reference viewer consumes ``BetaRadomization`` and ``haze_point_cloud``
from the STF devkit inside `lib/LiDAR_fog_sim`
(`pointcloud_viewer.py:2958-2975`; submodule not checked in). The published
model (Bijelic et al., CVPR'20) differs from the ICCV'21 fog sim (models/fog.py)
in two ways that we reproduce:

1. the extinction coefficient is *directionally randomized*: β(φ) is a smooth
   random harmonic field over azimuth (seeded), modelling inhomogeneous fog;
2. undetectable points are stochastically replaced by near-sensor clutter
   returns at a random fraction of the original range, instead of a shared
   soft-channel peak.

TPU-native shape: the harmonic field is a fixed bank of (n_harmonics) sine
coefficients sampled on host (seeded NumPy, mirroring the devkit's seeded
randomization); evaluation, detectability and clutter sampling are one fused
jittable kernel over the padded scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BetaRandomization:
    """Azimuth-dependent extinction field β(φ) = β·(1 + Σ a_k sin(kφ + ψ_k)).

    Seeded on host; ``coefficients()`` returns device-ready arrays consumed by
    ``haze_point_cloud``. amplitude decays as 1/k² so the field is smooth.
    """

    def __init__(self, beta: float, seed: int = 0, n_harmonics: int = 8,
                 strength: float = 0.3):
        self.beta = float(beta)
        self.seed = seed
        rng = np.random.default_rng(seed)
        k = np.arange(1, n_harmonics + 1)
        self.amps = (strength * rng.uniform(0, 1, n_harmonics) / k**2).astype(
            np.float32
        )
        self.phases = rng.uniform(0, 2 * np.pi, n_harmonics).astype(np.float32)
        self.ks = k.astype(np.float32)

    def coefficients(self):
        return (
            jnp.asarray(self.amps),
            jnp.asarray(self.phases),
            jnp.asarray(self.ks),
            jnp.float32(self.beta),
        )

    def get_beta(self, azimuth):
        """β at azimuth (radians); jittable, vectorized."""
        amps, phases, ks, beta = self.coefficients()
        mod = 1.0 + jnp.sum(
            amps * jnp.sin(ks * azimuth[..., None] + phases), axis=-1
        )
        return beta * jnp.maximum(mod, 0.05)

    def propagate_in_time(self, steps: int):
        """Advect the inhomogeneity field, as the viewer does before
        foggification (`pointcloud_viewer.py:2963-2964`:
        ``B.propagate_in_time(10)``). Each step drifts every harmonic's
        phase by a seeded per-harmonic velocity — the devkit's wind-drift
        intent with this field parameterization."""
        rng = np.random.default_rng([self.seed, 0x9E3779B9])
        velocity = rng.uniform(-0.1, 0.1, self.ks.shape[0]).astype(np.float32)
        self.phases = (
            (self.phases + steps * velocity * self.ks) % (2 * np.pi)
        ).astype(np.float32)
        return self


# drop-in alias matching the reference's (misspelled) class name
# (`pointcloud_viewer.py:55`)
BetaRadomization = BetaRandomization


class StfFogResult(NamedTuple):
    points: jax.Array        # (N, 5), label col: 0 kept, 2 clutter
    keep: jax.Array
    num_scattered: jax.Array
    num_attenuated: jax.Array
    num_removed: jax.Array


def haze_point_cloud_padded(
    points,
    mask,
    beta_coeffs,
    key,
    *,
    gain: float = 20.0,
    noise: float = 10.0,
    fraction_random: float = 0.05,
    clutter_min_range: float = 1.3,
):
    """Jittable STF foggification of a padded (N, 5) scan.

    Per point with range d, intensity i and direction-dependent β:
    - detectable iff the attenuated return i·e^{-2βd}·gain clears ``noise``;
    - detectable  -> intensity := i·e^{-2βd} (label 0);
    - undetectable -> with probability ``fraction_random`` a clutter return at
      range U(clutter_min_range, d) with a random sub-noise intensity
      (label 2), otherwise dropped.
    """
    amps, phases, ks, beta0 = beta_coeffs
    xyz = points[:, :3]
    intensity = points[:, 3]
    d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1), 1e-6)
    azimuth = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    mod = 1.0 + jnp.sum(
        amps * jnp.sin(ks * azimuth[:, None] + phases), axis=-1
    )
    beta = beta0 * jnp.maximum(mod, 0.05)

    transmittance = jnp.exp(-2.0 * beta * d)
    i_att = intensity * transmittance
    detectable = i_att * gain > noise

    k1, k2, k3 = jax.random.split(key, 3)
    make_clutter = (
        jax.random.uniform(k1, d.shape) < fraction_random
    ) & ~detectable
    frac = jax.random.uniform(k2, d.shape)
    r_new = clutter_min_range + frac * jnp.maximum(d - clutter_min_range, 0.0)
    i_clutter = jax.random.uniform(k3, d.shape) * noise

    scale = jnp.where(make_clutter, r_new / d, 1.0)
    new_xyz = xyz * scale[:, None]
    new_i = jnp.where(make_clutter, i_clutter, i_att)
    label = jnp.where(make_clutter, 2.0, 0.0)
    keep = mask & (detectable | make_clutter)

    out = jnp.concatenate([new_xyz, new_i[:, None], label[:, None]], axis=1)
    return StfFogResult(
        points=out,
        keep=keep,
        num_scattered=jnp.sum(keep & make_clutter).astype(jnp.int32),
        num_attenuated=jnp.sum(keep & detectable).astype(jnp.int32),
        num_removed=jnp.sum(mask & ~keep).astype(jnp.int32),
    )


def haze_point_cloud(pc, randomized_beta, arguments=None, seed: int = 0):
    """EXACT reference call contract (`pointcloud_viewer.py:2963-2970`):

        B = BetaRadomization(beta=..., seed=0)
        B.propagate_in_time(10)
        arguments = Namespace(sensor_type='Velodyne HDL-64E S3D',
                              fraction_random=0.05)
        pc = haze_point_cloud(pc, B, arguments)
        pc = pc[:, :n_features]

    Returns an (M, >=5) array whose columns start [x, y, z, intensity,
    label] — the viewer truncates back to its own column count. Only the
    devkit arguments the viewer sets are consumed: ``fraction_random`` and
    ``sensor_type`` (HDL-64E gain/noise defaults).
    """
    pc = np.asarray(pc)
    fraction_random = getattr(arguments, "fraction_random", 0.05)
    aug, _ = StfFogAugmenter(
        beta=randomized_beta.beta, seed=seed,
        fraction_random=fraction_random,
        _randomization=randomized_beta,
    )(pc)
    if pc.shape[1] > aug.shape[1]:
        extra = np.zeros((len(aug), pc.shape[1] - aug.shape[1]), aug.dtype)
        aug = np.concatenate([aug, extra], axis=1)
    return aug


class StfFogAugmenter:
    """Host-facing wrapper mirroring ``haze_point_cloud(pc, BetaRadomization)``."""

    def __init__(self, beta: float = 0.05, seed: int = 0,
                 _randomization=None, **kwargs):
        self.randomization = _randomization or BetaRandomization(
            beta, seed=seed
        )
        self.kwargs = kwargs
        self.seed = seed
        self._fn = jax.jit(
            lambda pts, m, coeffs, key: haze_point_cloud_padded(
                pts, m, coeffs, key, **kwargs
            )
        )

    def __call__(self, pc: np.ndarray):
        from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

        n = pc.shape[0]
        cap = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
        padded = pad_cloud(np.asarray(pc), cap)
        res = self._fn(
            jnp.asarray(padded.points),
            jnp.asarray(padded.mask),
            self.randomization.coefficients(),
            jax.random.PRNGKey(self.seed),
        )
        res = jax.device_get(res)
        stats = {
            "num_scattered": int(res.num_scattered),
            "num_attenuated": int(res.num_attenuated),
            "num_removed": int(res.num_removed),
        }
        return res.points[res.keep], stats
