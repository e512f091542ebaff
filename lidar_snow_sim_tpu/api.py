"""Drop-in reference-compatible API.

Module-level `augment` and `ground_water_augmentation` with the reference's
exact argument names, defaults and return contracts
(`tools/snowfall/simulation.py:427-446`,
`tools/wet_ground/augmentation.py:25-41`), so code written against the
reference switches by changing one import. The particle files are the
reference's `{prefix}_{line}.npy` banks; loaded banks and compiled kernels
are cached per (prefix, config) so repeated calls amortize compilation like
the reference amortizes nothing.

TPU notes: beam_divergence stays in DEGREES (reference convention);
`show_progressbar` is accepted and ignored (one fused kernel has no
per-channel progress to report); `root_path` resolves the particle files.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_AUGMENTER_CACHE: dict = {}
_WET_CACHE: dict = {}


def _next_pow2(n: int, floor: int = 2048) -> int:
    p = floor
    while p < n:
        p <<= 1
    return p


def augment(
    pc: np.ndarray,
    particle_file_prefix: str,
    beam_divergence: float,
    shuffle: bool = True,
    show_progressbar: bool = False,
    only_camera_fov: bool = True,
    noise_floor: float = 0.7,
    root_path: str | None = None,
):
    """Snowfall augmentation with the reference's signature and semantics.

    Returns ((num_attenuated, num_removed, avg_intensity_diff), aug_pc) —
    the reference's stats tuple and N-by-5 cloud with the 0/1/2 label column.
    """
    del show_progressbar  # no per-channel loop to report progress on
    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.camera import camera_fov_mask
    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.models.snowfall import SnowfallAugmenter
    from lidar_snow_sim_tpu.sampling.banks import load_bank_files

    pc = np.asarray(pc)

    directory = Path(root_path) if root_path else Path(
        os.environ.get("SNOWFLAKES_DIR", "snowflakes")
    )
    cap = _next_pow2(len(pc))
    key = (str(directory), particle_file_prefix, beam_divergence,
           noise_floor, cap)
    if key not in _AUGMENTER_CACHE:
        pch = max(cap // 64, 256)
        cfg = SnowfallConfig(
            beam_divergence_deg=beam_divergence,
            noise_floor=noise_floor,
            max_points=cap,
            assembly="dense",
            channel_capacity=pch,
            # ~8 blocks per channel keeps each block's azimuth span (and so
            # its shared bank slice) narrow even for sparse scans
            block_points=max(min(128, pch // 8), 32),
        )
        bank = load_bank_files(
            directory, particle_file_prefix,
            window_size=cfg.window_size,
            wide_threshold=cfg.wide_threshold,
            wide_capacity=cfg.wide_capacity,
        )
        _AUGMENTER_CACHE[key] = SnowfallAugmenter(
            bank=bank, calib=load_hdl64_calib(), cfg=cfg
        )
    stats, aug_pc = _AUGMENTER_CACHE[key](pc, shuffle=shuffle)
    if only_camera_fov:
        # reference order (simulation.py:532-540): augment the FULL cloud,
        # crop to the camera FOV at the END, and count the cropped points in
        # num_removed; num_attenuated / avg_intensity_diff stay pre-crop.
        fov = np.asarray(camera_fov_mask(aug_pc[:, :3]))
        num_attenuated, num_removed, avg_intensity_diff = stats
        stats = (
            num_attenuated,
            num_removed + int(np.logical_not(fov).sum()),
            avg_intensity_diff,
        )
        aug_pc = aug_pc[fov]
    return stats, aug_pc


def ground_water_augmentation(
    pointcloud: np.ndarray,
    water_height: float = 0.001,
    pavement_depth: float = 0.0012,
    noise_floor: float = 0.7,
    power_factor: float = 15,
    estimation_method: str = "linear",
    flat_earth: bool = False,
    debug: bool = False,
    delta: float = 0.5,
    replace: bool = True,
):
    """Wet-ground augmentation with the reference's signature; returns the
    augmented N-by-5 cloud (reference `augmentation.py:25-161`)."""
    del debug  # plotting branches are a host concern; see utils.ground_stats
    from lidar_snow_sim_tpu.config import WetGroundConfig
    from lidar_snow_sim_tpu.models.wet_ground import WetGroundAugmenter

    pointcloud = np.asarray(pointcloud)
    cap = _next_pow2(len(pointcloud))
    cfg = WetGroundConfig(
        water_height=water_height,
        pavement_depth=pavement_depth,
        noise_floor=noise_floor,
        power_factor=power_factor,
        estimation_method=estimation_method,
        flat_earth=flat_earth,
        delta=delta,
        replace=replace,
    )
    key = (cfg, cap)
    if key not in _WET_CACHE:
        _WET_CACHE[key] = WetGroundAugmenter(cfg=cfg, max_points=cap)
    return _WET_CACHE[key](pointcloud)
