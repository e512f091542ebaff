"""Batched (vmapped) and sharded augmentation steps.

A "step" here is the full offline-datagen unit: snowfall augmentation
optionally chained with wet-ground reflectance (the viewer's snow+wet mode,
`pointcloud_viewer.py:2804-2840`), vmapped over a frame batch and sharded over
a (data, beam) device mesh. GSPMD turns the global masked reductions (plane
fit, noise histogram, statistics) into ICI collectives automatically; no
hand-written communication is needed for this workload (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax

from lidar_snow_sim_tpu.config import SnowfallConfig, WetGroundConfig
from lidar_snow_sim_tpu.models.snowfall import snowfall_augment
from lidar_snow_sim_tpu.models.wet_ground import wet_ground_augment
from lidar_snow_sim_tpu.parallel.mesh import batch_shardings


def snow_wet_step(
    points,
    mask,
    bank,
    calib_arrays,
    order,
    key,
    snow_cfg: SnowfallConfig,
    wet_cfg: WetGroundConfig | None,
):
    """One scan through snowfall (+ optional wet ground, replace=False chain
    like the viewer's snow+wet mode). Returns (SnowfallResult, WetGroundResult
    or None) on fixed shapes."""
    k_plane, k_wet = jax.random.split(key)
    snow = snowfall_augment(
        points, mask, bank, calib_arrays, order, k_plane, snow_cfg
    )
    if wet_cfg is None:
        return snow, None
    wet = wet_ground_augment(snow.points, snow.keep, k_wet, wet_cfg)
    return snow, wet


def batched_step(
    points,   # (B, N, 5)
    mask,     # (B, N)
    bank,
    calib_arrays,
    orders,   # (B, C)
    keys,     # (B,) PRNG keys
    snow_cfg: SnowfallConfig,
    wet_cfg: WetGroundConfig | None = None,
):
    """vmap over the frame batch; bank/calib broadcast."""
    return jax.vmap(
        snow_wet_step, in_axes=(0, 0, None, None, 0, 0, None, None)
    )(points, mask, bank, calib_arrays, orders, keys, snow_cfg, wet_cfg)


def make_sharded_step(mesh, snow_cfg, wet_cfg=None, donate: bool = False):
    """jit `batched_step` with (data, beam) shardings over `mesh`.

    With a sharded 'beam' (points) axis the Pallas kernels are disabled —
    GSPMD cannot partition a pallas_call across the point axis; the XLA
    dense path partitions cleanly. Pure data-parallel meshes (beam=1) keep
    the kernels: each device runs its own whole scans.
    """
    import dataclasses

    if mesh.shape.get("beam", 1) > 1 and snow_cfg.use_pallas:
        snow_cfg = dataclasses.replace(snow_cfg, use_pallas=False)
    pts_s, mask_s, rep = batch_shardings(mesh)

    fn = functools.partial(
        batched_step, snow_cfg=snow_cfg, wet_cfg=wet_cfg
    )
    return jax.jit(
        fn,
        in_shardings=(pts_s, mask_s, rep, rep, rep, rep),
        donate_argnums=(0,) if donate else (),
    )
