from lidar_snow_sim_tpu.utils.pointcloud import (
    PaddedCloud,
    load_velodyne_bin,
    save_velodyne_bin,
    pad_cloud,
    compact_cloud,
)
from lidar_snow_sim_tpu.utils.splits import read_split
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

__all__ = [
    "PaddedCloud",
    "load_velodyne_bin",
    "save_velodyne_bin",
    "pad_cloud",
    "compact_cloud",
    "read_split",
    "synthetic_scan",
]
