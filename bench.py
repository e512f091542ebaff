"""Benchmark: snowfall augmentation throughput vs the CPU reference path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: STF-like 64-beam scans (synthetic ray-cast scene, ~45k points in the
camera FOV), heavy snowfall (2.5 mm/h, terminal velocity 1.6 m/s, gunn
distribution — a (rate, velocity) combo from the reference datagen grid,
precompute.py:20-21). Baseline = the measured NumPy oracle (literal reference
semantics) on the same scan, extrapolated from a point subsample because the
full scan takes minutes per scan on CPU (BASELINE.md).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

CACHE = Path(__file__).parent / "banks_cache"
SNOWFALL_RATE = 2.5
TERMINAL_VELOCITY = 1.6
DISTRIBUTION = "gunn"
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
ORACLE_POINTS = int(os.environ.get("BENCH_ORACLE_POINTS", "400"))


def get_bank_sets():
    from lidar_snow_sim_tpu.sampling import (
        compute_occupancy,
        dart_throwing_fast,
        snowfall_rate_to_rainfall_rate,
    )

    CACHE.mkdir(exist_ok=True)
    rate = snowfall_rate_to_rainfall_rate(SNOWFALL_RATE, TERMINAL_VELOCITY)
    occ = compute_occupancy(SNOWFALL_RATE, TERMINAL_VELOCITY)
    path = CACHE / f"{DISTRIBUTION}_{rate:.4f}_{occ:.3e}.npz"
    if path.exists():
        with np.load(path) as z:
            return [z[f"c{i}"] for i in range(64)]
    rng = np.random.default_rng(42)
    sets = [
        dart_throwing_fast(occ, rate, 80.0, rng, DISTRIBUTION)
        for _ in range(64)
    ]
    np.savez_compressed(path, **{f"c{i}": s for i, s in enumerate(sets)})
    return sets


def main():
    t_setup = time.time()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(CACHE / "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.models.snowfall import (
        calib_device_arrays,
        snowfall_augment,
    )
    from lidar_snow_sim_tpu.sampling.banks import build_bank
    from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=870, seed=0, calib=calib)
    sets = get_bank_sets()

    cfg = SnowfallConfig(
        max_points=1 << int(np.ceil(np.log2(len(pc)))),
        window_size=128,
        wide_capacity=16,
        max_occluders=24,
        max_bumps=16,
        point_chunk=2048,
        assembly=os.environ.get("BENCH_ASSEMBLY", "dense"),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
        channel_capacity=1024,
        block_points=int(os.environ.get("BENCH_BLOCK", "128")),
        slice_width=int(os.environ.get("BENCH_SLICE", "1152")),
        chunk_group=8,
    )
    bank = jax.device_put(
        build_bank(
            sets,
            window_size=cfg.window_size,
            wide_threshold=cfg.wide_threshold,
            wide_capacity=cfg.wide_capacity,
        )
    )
    calib_arrays = calib_device_arrays(calib)

    padded = pad_cloud(pc, cfg.max_points)
    points = jnp.broadcast_to(
        jnp.asarray(padded.points), (BATCH,) + padded.points.shape
    )
    mask = jnp.broadcast_to(jnp.asarray(padded.mask), (BATCH,) + padded.mask.shape)
    orders = jnp.asarray(
        np.stack([np.random.default_rng(i).permutation(64) for i in range(BATCH)]),
        jnp.int32,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    # bank/calib enter as ARGUMENTS, not closure captures: captured device
    # arrays are embedded as MLIR constants, which forces a device->host
    # fetch during lowering (fails over the remote-TPU tunnel)
    vstep = jax.vmap(
        lambda p, m, o, k, b, ca: snowfall_augment(p, m, b, ca, o, k, cfg),
        in_axes=(0, 0, 0, 0, None, None),
    )

    # Timing methodology for the remote-TPU tunnel: host-side loops are
    # unreliable here (block_until_ready does not reliably block; repeated
    # identical dispatches can hit an execution cache; every eager op pays
    # RPC latency). So the ENTIRE measurement runs on device: one jitted
    # lax.scan chains I steps through a value-preserving data dependency,
    # and the per-step time is the SLOPE between a short and a long chain,
    # which cancels dispatch/transfer constants.
    def chain(points, mask, orders, keys_stacked, b, ca):
        def body(pts, keys_i):
            out = vstep(pts, mask, orders, keys_i, b, ca)
            nxt = points + out.avg_intensity_diff.sum() * 0.0
            return nxt, (out.num_attenuated,
                         out.window_overflow + out.occluder_overflow
                         + out.bump_overflow + out.channel_overflow
                         + out.compact_overflow)
        _, (nas, ovf) = jax.lax.scan(body, points, keys_stacked)
        return nas, ovf

    chain_j = jax.jit(chain)
    n_iters = max(int(os.environ.get("BENCH_ITERS", "10")), 2)
    short, long_ = 2, 2 + n_iters

    def run_chain(n):
        ks = jnp.stack(
            [jax.random.split(jax.random.PRNGKey(1000 + i), BATCH)
             for i in range(n)]
        )
        t0 = time.time()
        nas, ovf = chain_j(points, mask, orders, ks, bank, calib_arrays)
        nas = np.asarray(nas)   # value fetch forces completion
        ovf = np.asarray(ovf)
        return time.time() - t0, nas, ovf

    run_chain(short)            # compile both shapes
    run_chain(long_)
    t_compiled = time.time()
    t_short, _, _ = run_chain(short)
    t_long, nas, ovf = run_chain(long_)
    out_overflow = int(ovf.sum())
    dt = (t_long - t_short) / (long_ - short)
    scans_per_sec = BATCH / dt
    points_per_sec = scans_per_sec * len(pc)

    # sanity: capacities honored (summed across the whole long chain)
    overflow = out_overflow

    # CPU oracle baseline (literal reference semantics), subsampled + scaled
    from lidar_snow_sim_tpu.oracle.snowfall import augment as augment_oracle

    sub_idx = np.random.default_rng(0).choice(
        len(pc), size=min(ORACLE_POINTS, len(pc)), replace=False
    )
    sub = pc[np.sort(sub_idx)]
    order0 = np.asarray(orders[0])
    # best of 3 trials: the oracle is a host-CPU loop, so a single timing is
    # vulnerable to transient load; min is the honest per-scan cost
    t_oracle = np.inf
    for _ in range(3):
        t0 = time.time()
        augment_oracle(
            sub.astype(np.float64),
            sets,
            calib,
            order0,
            float(np.degrees(3e-3)),
            plane=(np.array([0.0, 0.0, -1.0]), -1.55),
        )
        t_oracle = min(t_oracle, time.time() - t0)
    oracle_scans_per_sec = 1.0 / (t_oracle * len(pc) / len(sub))

    result = {
        "metric": "augmented_scans_per_sec_snow2.5mmh",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / oracle_scans_per_sec, 1),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "points_per_scan": len(pc),
                    "points_per_sec": round(points_per_sec),
                    "batch": BATCH,
                    "step_ms": round(dt * 1e3, 2),
                    "compile_s": round(t_compiled - t_setup, 1),
                    "oracle_scans_per_sec_extrapolated": round(
                        oracle_scans_per_sec, 5
                    ),
                    "oracle_subsample": len(sub),
                    "capacity_overflows": overflow,
                    "backend": jax.default_backend(),
                    "particles_per_channel_mean": int(
                        np.mean([len(s) for s in sets])
                    ),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
