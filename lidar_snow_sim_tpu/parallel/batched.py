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
    wet = wet_ground_augment(snow.planes, snow.keep, k_wet, wet_cfg)
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


IN_META_WIDTH = 3 + 64   # [n_points, key_hi, key_lo, order(64)]
OUT_META_WIDTH = 13      # [n_keep, att, rem, avg_diff, 5 overflows,
#                           out_overflow, wet_modified, wet_removed,
#                           wet_bailed]


def datagen_packed_step(
    points,   # (B, N, 4) f32: x, y, z, intensity
    chan,     # (B, N) u8: channel ids
    in_meta,  # (B, 3 + C) i32: [n_points, key_hi, key_lo, order(C)]
    bank,
    calib_arrays,
    snow_cfg: SnowfallConfig,
    wet_cfg: WetGroundConfig | None = None,
    out_points: int | None = None,
):
    """Transfer-minimal batched step for the offline-datagen driver.

    The remote-TPU tunnel moves ~35 MB/s with ~70 ms latency per buffer
    (measured; see BASELINE.md), so datagen steady-state is TRANSFER-bound
    and every byte on the host<->device surface counts:

    - Up: (B, N, 4) f32 coordinates+intensity, (B, N) u8 channel ids
      (channel is 6 bits — carrying it as an f32 column wastes 3 bytes/pt),
      and one (B, 3+C) i32 meta row (validity mask = `iota < n_points`,
      PRNG key, channel order).
    - Down: kept rows are compacted to the FRONT on device (stable argsort
      of ~keep — identical row order to the host-side `points[keep]`
      boolean filter) and only `out_points` rows travel (points removed by
      the noise floor never earn their bytes back; overflow is COUNTED and
      the driver grows the capacity — never a silent truncation). For
      snowfall-only runs the output intensity column is integral
      (`jnp.round`, simulation.py:516 semantics), so intensity and the
      label column pack losslessly into one i32 plane
      (`round(i) << 2 | label`, bitcast to f32) — 4 output columns, not 5.
      Wet-ground intensities are floats (augmentation.py:126-147), so with
      a `wet_cfg` the output stays 5-wide.

    Returns (planes_c (B, 4|5, P) f32 PLANE-MAJOR — rows x, y, z, then
    the packed intensity|label plane (4-wide) or separate intensity and
    label planes (5-wide, wet runs) — and out_meta (B, 13) i32):
    out_meta = [n_keep, num_attenuated, num_removed, avg_intensity_diff,
    window/occluder/bump/channel/compact overflow, out_overflow
    (max(n_keep - P, 0)), wet_modified, wet_removed, wet_bailed]
    (wet columns zero when wet_cfg is None).
    """
    import jax.numpy as jnp

    n = points.shape[1]
    p_out = out_points or n

    def one(pts4, ch, meta):
        n_pts = meta[0]
        pts = jnp.concatenate(
            [pts4, ch.astype(jnp.float32)[:, None]], axis=1
        )
        mask = jnp.arange(pts.shape[0], dtype=jnp.int32) < n_pts
        key = jax.lax.bitcast_convert_type(meta[1:3], jnp.uint32)
        order = meta[3:]
        snow, wet = snow_wet_step(
            pts, mask, bank, calib_arrays, order, key, snow_cfg, wet_cfg
        )
        res = wet if wet is not None else snow
        perm = jnp.argsort(~res.keep, stable=True)[:p_out]
        planes_c = res.planes[:, perm]          # (5, P) plane-major gather
        n_keep = jnp.sum(res.keep.astype(jnp.int32))
        if wet_cfg is None:
            packed = jax.lax.bitcast_convert_type(
                (jnp.round(planes_c[3]).astype(jnp.int32) << 2)
                | planes_c[4].astype(jnp.int32),
                jnp.float32,
            )
            planes_c = jnp.concatenate(
                [planes_c[:3], packed[None]], axis=0
            )
        out_meta = jnp.stack(
            [
                n_keep,
                snow.num_attenuated,
                snow.num_removed,
                snow.avg_intensity_diff,
                snow.window_overflow,
                snow.occluder_overflow,
                snow.bump_overflow,
                snow.channel_overflow,
                snow.compact_overflow,
                jnp.maximum(n_keep - p_out, 0),
                wet.num_modified if wet is not None else jnp.int32(0),
                wet.num_removed if wet is not None else jnp.int32(0),
                (wet.bailed_out.astype(jnp.int32)
                 if wet is not None else jnp.int32(0)),
            ]
        )
        return planes_c, out_meta

    return jax.vmap(one)(points, chan, in_meta)


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
    if snow_cfg.batch_fold:
        # a folded pallas_call spanning the data-sharded batch axis would
        # force GSPMD to all-gather the batch; keep the per-frame form
        snow_cfg = dataclasses.replace(snow_cfg, batch_fold=False)
    pts_s, mask_s, rep = batch_shardings(mesh)

    fn = functools.partial(
        batched_step, snow_cfg=snow_cfg, wet_cfg=wet_cfg
    )
    return jax.jit(
        fn,
        in_shardings=(pts_s, mask_s, rep, rep, rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_packed_step(mesh, snow_cfg, wet_cfg=None, out_points=None):
    """jit `datagen_packed_step` with (data, beam) shardings over `mesh`
    (same Pallas gating as make_sharded_step); the (B, N) u8 channel plane
    shards like the boolean mask."""
    import dataclasses

    if mesh.shape.get("beam", 1) > 1 and snow_cfg.use_pallas:
        snow_cfg = dataclasses.replace(snow_cfg, use_pallas=False)
    if snow_cfg.batch_fold:
        snow_cfg = dataclasses.replace(snow_cfg, batch_fold=False)
    pts_s, chan_s, rep = batch_shardings(mesh)
    meta_s = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    fn = functools.partial(
        datagen_packed_step,
        snow_cfg=snow_cfg,
        wet_cfg=wet_cfg,
        out_points=out_points,
    )
    return jax.jit(fn, in_shardings=(pts_s, chan_s, meta_s, rep, rep))
