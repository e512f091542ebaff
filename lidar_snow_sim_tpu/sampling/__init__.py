from lidar_snow_sim_tpu.sampling.distributions import (
    compute_occupancy,
    snowfall_rate_to_rainfall_rate,
    rainfall_rate_to_snowfall_rate,
    sekhon_srivastava,
    gunn_marshall,
)
from lidar_snow_sim_tpu.sampling.dart import dart_throwing, dart_throwing_fast
from lidar_snow_sim_tpu.sampling.banks import ParticleBank, build_bank, load_bank_files

__all__ = [
    "compute_occupancy",
    "snowfall_rate_to_rainfall_rate",
    "rainfall_rate_to_snowfall_rate",
    "sekhon_srivastava",
    "gunn_marshall",
    "dart_throwing",
    "dart_throwing_fast",
    "ParticleBank",
    "build_bank",
    "load_bank_files",
]
