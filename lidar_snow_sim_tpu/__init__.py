"""lidar_snow_sim_tpu — TPU-native LiDAR snowfall / wet-ground simulation framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the CVPR'22
"LiDAR Snowfall Simulation for Robust 3D Object Detection" toolkit
(reference: SysCV/LiDAR_snow_sim). The compute path is fully jittable and
vmap/shard_map-parallel: per-beam particle occlusion, pulse re-simulation,
wet-ground Fresnel reflectance, plane fitting, and adaptive noise estimation all
run as fixed-shape masked kernels on TPU.

Point-cloud contract (matches reference `tools/snowfall/simulation.py:55`):
N-by-5 float32 (x, y, z, intensity, channel); intensity in [0, 255]; channel in
[0, 63]. After augmentation, column 4 holds a label: 0 = unchanged,
1 = attenuated (snow) / modified ground (wet), 2 = scattered by snow.
"""

__version__ = "0.1.0"

from lidar_snow_sim_tpu.config import SnowfallConfig, WetGroundConfig
from lidar_snow_sim_tpu.calib import SensorCalib, load_hdl64_calib


def __getattr__(name):
    """Lazy top-level API: heavyweight models import on first touch so that
    `import lidar_snow_sim_tpu` stays cheap (no jax trace-time work)."""
    lazy = {
        "augment": "lidar_snow_sim_tpu.api",
        "ground_water_augmentation": "lidar_snow_sim_tpu.api",
        "SnowfallAugmenter": "lidar_snow_sim_tpu.models.snowfall",
        "WetGroundAugmenter": "lidar_snow_sim_tpu.models.wet_ground",
        "FogAugmenter": "lidar_snow_sim_tpu.models.fog",
        "FogParameterSet": "lidar_snow_sim_tpu.models.fog",
        "ParameterSet": "lidar_snow_sim_tpu.models.fog",
        "simulate_fog": "lidar_snow_sim_tpu.models.fog",
        "StfFogAugmenter": "lidar_snow_sim_tpu.models.stf_fog",
        "BetaRandomization": "lidar_snow_sim_tpu.models.stf_fog",
        "LISA": "lidar_snow_sim_tpu.models.lisa",
        "dynamic_radius_outlier_filter": "lidar_snow_sim_tpu.models.dror",
        "CameraCalibration": "lidar_snow_sim_tpu.camera",
        "camera_fov_mask": "lidar_snow_sim_tpu.camera",
        "ParticleBank": "lidar_snow_sim_tpu.sampling.banks",
        "build_bank": "lidar_snow_sim_tpu.sampling.banks",
        "load_bank_files": "lidar_snow_sim_tpu.sampling.banks",
        "PointPillarsConfig": "lidar_snow_sim_tpu.models.pointpillars",
        "detect": "lidar_snow_sim_tpu.models.pointpillars",
        "generate_anchors": "lidar_snow_sim_tpu.models.pointpillars",
        "config_from_openpcdet_yaml": "lidar_snow_sim_tpu.models.pointpillars",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "augment",
    "ground_water_augmentation",
    "SnowfallConfig",
    "WetGroundConfig",
    "SensorCalib",
    "load_hdl64_calib",
    "SnowfallAugmenter",
    "WetGroundAugmenter",
    "FogAugmenter",
    "FogParameterSet",
    "ParameterSet",
    "simulate_fog",
    "StfFogAugmenter",
    "BetaRandomization",
    "LISA",
    "dynamic_radius_outlier_filter",
    "CameraCalibration",
    "camera_fov_mask",
    "ParticleBank",
    "build_bank",
    "load_bank_files",
    "PointPillarsConfig",
    "detect",
    "generate_anchors",
    "config_from_openpcdet_yaml",
    "__version__",
]
