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

__all__ = [
    "SnowfallConfig",
    "WetGroundConfig",
    "SensorCalib",
    "load_hdl64_calib",
    "__version__",
]
