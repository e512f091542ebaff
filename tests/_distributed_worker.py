"""Worker for the 2-process `jax.distributed` datagen rehearsal.

Launched (twice) by tests/test_parallel.py::test_two_process_distributed_stats
with argv = (process_id, coordinator_port, out_dir). Each process runs the
share-nothing shard `ids[process_id::2]` of a 4-frame synthetic datagen into a
SHARED output directory (the `tools/precompute.py --shard i/n` deployment
mode), then merges per-host DatagenStats with `all_hosts_stats` — the psum
path that a real pod would use (SURVEY.md §2.4/§5 distributed rows).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from lidar_snow_sim_tpu.parallel import distributed

    ok = distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert ok, "distributed.initialize declined a 2-process setup"
    assert jax.process_count() == 2

    import numpy as np

    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.parallel.datagen import run_snowfall_datagen
    from lidar_snow_sim_tpu.parallel.distributed import (
        all_hosts_stats,
        is_primary_host,
    )
    from lidar_snow_sim_tpu.sampling.banks import build_bank
    from lidar_snow_sim_tpu.sampling.dart import dart_throwing_fast
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    calib = load_hdl64_calib()
    cfg = SnowfallConfig(
        max_points=4096, window_size=128, wide_capacity=32,
        max_occluders=16, max_bumps=8, point_chunk=512, ransac_trials=16,
    )
    rng = np.random.default_rng(7)
    sets = [
        dart_throwing_fast(
            occupancy_ratio=2e-7, precipitation_rate=5.0, R_0=80.0,
            rng=rng, distribution="gunn",
        )
        for _ in range(64)
    ]
    bank = build_bank(
        sets, window_size=cfg.window_size,
        wide_threshold=cfg.wide_threshold, wide_capacity=cfg.wide_capacity,
    )
    scans = {
        f"f{i}": synthetic_scan(n_azimuth=60, seed=i, calib=calib)[:4096]
        for i in range(4)
    }
    ids = sorted(scans)[pid::2]  # share-nothing shard pid/2

    local = run_snowfall_datagen(
        ids, scans.__getitem__, out_dir, bank, calib, cfg,
        batch=2, seed=0, shuffle_channels=False,
    )
    merged = all_hosts_stats(local)

    fields = (
        "frames_done", "frames_skipped", "frames_failed",
        "points_in", "points_out", "attenuated", "removed",
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "primary": is_primary_host(),
                "ids": ids,
                "local": {f: getattr(local, f) for f in fields},
                "merged": {f: getattr(merged, f) for f in fields},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
