"""Command-line tools mirroring the reference's offline drivers.

- ``python -m lidar_snow_sim_tpu.tools.gen_banks``  — particle-bank
  generation grid (reference `tools/snowfall/sampling.py:360-413`)
- ``python -m lidar_snow_sim_tpu.tools.precompute`` — offline augmented
  dataset generation (reference `tools/snowfall/precompute.py`)
- ``python -m lidar_snow_sim_tpu.tools.inspect``    — headless per-scan
  augmentation/stats/BEV dump (replaces the Qt viewer's readouts)
"""
