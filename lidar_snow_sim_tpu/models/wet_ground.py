"""Wet-ground reflectance augmentation — jittable TPU pipeline.

Device port of `tools/wet_ground/augmentation.py:25-161`: RANSAC ground plane,
incident angles, laser power / adaptive noise estimation, per-point
reflectivity, two-interface Fresnel transmittance, water-fill blending, and
the adaptive-threshold drop rule. Everything is fixed-shape and masked; the
host wrapper reproduces the reference's output ordering (non-ground points
first, surviving ground points appended with label 1).

The reference bails out unchanged when fewer than 1000 ground points exist
(augmentation.py:51-52); here that is a `jnp.where` select on the same
condition, so the kernel stays branch-free.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_snow_sim_tpu.config import WetGroundConfig
from lidar_snow_sim_tpu.ops.fitting import ransac_plane
from lidar_snow_sim_tpu.ops.fresnel import total_transmittance_from_ground
from lidar_snow_sim_tpu.ops.laser import estimate_laser_parameters


class WetGroundResult(NamedTuple):
    # (5, N) PLANE-MAJOR output: rows x, y, z, intensity, label. Plane-major
    # avoids the 25.6x HBM lane padding a trailing 5-wide axis pays under
    # TPU (8, 128) tiling; host wrappers transpose back to the reference's
    # (n, 5) rows (augmentation.py:155-161).
    planes: jax.Array
    keep: jax.Array        # (N,) bool (non-ground & padding-invalid => mask)
    is_ground: jax.Array   # (N,) bool
    bailed_out: jax.Array  # scalar bool: <1000 ground points, input unchanged
    num_modified: jax.Array  # i32: surviving ground points
    num_removed: jax.Array   # i32: ground points dropped by the threshold


def wet_ground_augment(
    planes,
    mask,
    key,
    cfg: WetGroundConfig,
    plane=None,
):
    """Jittable wet-ground augmentation on a padded (5, N) plane-major scan
    (rows x, y, z, intensity, label — SnowfallResult.planes layout). The
    (N, 3) views below are XLA-fused slices of the plane rows, not
    materialized padded buffers; the math is unchanged vs the row-major
    version (bit-identical outputs)."""
    xyz = planes[:3].T
    intensity = planes[3]

    if plane is None:
        w, h = ransac_plane(xyz, mask, key, trials=cfg.ransac_trials)
    else:
        w, h = plane

    hog = xyz @ w
    ground = mask & ((hog + h) < cfg.delta) & ((hog + h) > -cfg.delta)
    n_ground = jnp.sum(ground)
    bail = n_ground < cfg.min_ground_points

    dist = jnp.linalg.norm(xyz, axis=-1)
    if cfg.flat_earth:
        cos_arg = -xyz[:, 2] / jnp.maximum(dist, 1e-12)
    else:
        cos_arg = (xyz @ w) / (jnp.maximum(dist, 1e-12) * jnp.linalg.norm(w))
    incident = jnp.arccos(jnp.clip(cos_arg, -1.0, 1.0))

    relative_output, threshold = estimate_laser_parameters(
        xyz,
        intensity,
        incident,
        ground,
        power_factor=cfg.power_factor,
        noise_floor=cfg.noise_floor,
        estimation_method=cfg.estimation_method,
    )

    cos_inc = jnp.cos(incident)
    reflectivities = intensity / cos_inc / relative_output

    _, ts, _, tp, _ = total_transmittance_from_ground(
        incident,
        nair=cfg.n_air,
        nw=cfg.n_water,
        rho=jnp.clip(reflectivities, cfg.min_reflectivity, 1.0),
    )
    t = jnp.maximum(tp, ts)

    # blend clear vs wet reflection; 45-degree thread profile assumption
    f = np.clip(cfg.water_height / cfg.pavement_depth, 0.0, 1.0)
    tw = (1 - f) * reflectivities + f * t / incident

    new_int = jnp.clip(relative_output * cos_inc * tw, 0.0, intensity)
    gate = threshold * cos_inc
    new_int = jnp.where(new_int < gate, 0.0, new_int)
    ground_keep = new_int > gate

    out_intensity = jnp.where(ground & ~bail, new_int, intensity)
    # replace=True zeroes every label before marking ground (augmentation.py:155-159)
    non_ground_label = 0.0 if cfg.replace else planes[4]
    label = jnp.where(ground & ~bail, 1.0, non_ground_label)

    keep = jnp.where(bail, mask, mask & (~ground | ground_keep))
    out = jnp.stack(
        [
            planes[0],
            planes[1],
            planes[2],
            jnp.where(bail, intensity, out_intensity),
            jnp.where(bail, planes[4], label),
        ]
    )
    num_modified = jnp.sum(ground & ground_keep & ~bail).astype(jnp.int32)
    num_removed = jnp.sum(ground & ~ground_keep & ~bail).astype(jnp.int32)
    return WetGroundResult(
        planes=out,
        keep=keep,
        is_ground=ground & ~bail,
        bailed_out=bail,
        num_modified=num_modified,
        num_removed=num_removed,
    )


def filter_below_ground(pointcloud, w, h, margin: float = 0.5):
    """Drop points more than `margin` above the plane's negated offset —
    the reference's pre-filter (`tools/wet_ground/augmentation.py:164-168`):
    keeps rows with w·p + h < margin."""
    pc = np.asarray(pointcloud)
    above = pc[:, :3] @ np.asarray(w) + h < margin
    return pc[above]


@dataclasses.dataclass
class WetGroundAugmenter:
    """Host wrapper matching the reference's
    `ground_water_augmentation(pc, ...) -> aug_pc` contract, including the
    output ordering (non-ground first, surviving ground appended)."""

    cfg: WetGroundConfig = WetGroundConfig()
    max_points: int = 32768
    seed: int = 0

    def __post_init__(self):
        self._fn = jax.jit(wet_ground_augment, static_argnames=("cfg",))

    def __call__(self, pc, plane=None):
        from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

        padded = pad_cloud(np.asarray(pc), self.max_points)
        res = jax.device_get(
            self._fn(
                jnp.asarray(np.ascontiguousarray(padded.points.T)),
                jnp.asarray(padded.mask),
                jax.random.PRNGKey(self.seed),
                self.cfg,
                plane=None
                if plane is None
                else (jnp.asarray(plane[0], jnp.float32), jnp.float32(plane[1])),
            )
        )
        n = len(pc)
        pts = res.planes.T[:n]
        keep, is_g = res.keep[:n], res.is_ground[:n]
        if bool(res.bailed_out):
            return np.asarray(pc)
        non_ground = pts[~is_g & keep]
        ground_kept = pts[is_g & keep]
        return np.concatenate([non_ground, ground_kept], axis=0)
