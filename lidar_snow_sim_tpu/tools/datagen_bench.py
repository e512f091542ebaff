"""End-to-end offline-datagen wall-clock benchmark (VERDICT r2 item #6).

Measures the FULL production path on the current backend — host scan IO,
pad, jitted batched augmentation, host compaction, .bin writes, manifest —
not just the device step: it validates whether the single IO-prefetch
thread keeps up with the device at bench throughput.

Flow: synthesize N scans to .bin once (cached), generate the heavy
reference bank as {prefix}_{line}.npy files once (cached), then drive
tools/precompute.py's exact machinery (run_snowfall_datagen via the CLI
main) over one grid combo and report scans/s INCLUDING everything.

Usage: python -m lidar_snow_sim_tpu.tools.datagen_bench [--frames 200]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rate", type=float, default=2.5)
    ap.add_argument("--velocity", type=float, default=1.6)
    ap.add_argument("--mode", default="gunn")
    ap.add_argument("--root", default="banks_cache/datagen_bench",
                    help="work dir (scans + banks cached here; outputs "
                         "cleared each run)")
    ap.add_argument("--wet", action="store_true")
    ap.add_argument("--out", default=None, help="write the JSON report here")
    args = ap.parse_args(argv)

    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.sampling import (
        compute_occupancy,
        dart_throwing_fast,
        snowfall_rate_to_rainfall_rate,
    )
    from lidar_snow_sim_tpu.tools.precompute import main as precompute_main
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    root = Path(args.root)
    lidar_dir = root / "lidar_hdl64_strongest"
    bank_dir = root / "snowflakes"
    calib = load_hdl64_calib()

    # --- one-time scene + bank materialization (cached across runs) ---
    lidar_dir.mkdir(parents=True, exist_ok=True)
    split_lines = []
    t_scene = time.time()
    n_points = []
    for i in range(args.frames):
        sid = f"2020-01-01_{i:05d}"
        split_lines.append(sid.replace("_", ","))
        p = lidar_dir / f"{sid}.bin"
        if not p.exists():
            pc = synthetic_scan(n_azimuth=870, seed=i, calib=calib)
            pc.astype(np.float32).tofile(p)
        n_points.append(p.stat().st_size // (5 * 4))
    split = root / "split.txt"
    split.write_text("\n".join(split_lines) + "\n")
    t_scene = time.time() - t_scene

    rr = snowfall_rate_to_rainfall_rate(args.rate, args.velocity)
    occ = compute_occupancy(args.rate, args.velocity)
    prefix = f"{args.mode}_{rr}_{occ}"
    bank_dir.mkdir(parents=True, exist_ok=True)
    t_banks = time.time()
    if not (bank_dir / f"{prefix}_64.npy").exists():
        rng = np.random.default_rng(42)
        for line in range(1, 65):
            np.save(
                bank_dir / f"{prefix}_{line}.npy",
                dart_throwing_fast(occ, rr, 80.0, rng, args.mode),
            )
    t_banks = time.time() - t_banks

    # --- tunnel transfer probe: datagen steady-state is TRANSFER-bound
    # over the remote-TPU tunnel (the bench slope deliberately excludes
    # per-batch transfers), so the report carries the SAME-SESSION measured
    # put/get bandwidth and the resulting transfer-bound ceiling — the
    # number steady_scans_per_sec should be judged against. On local PCIe
    # (>8 GB/s) the same transfers are <2% of the device step.
    import jax

    def _probe_tunnel(nbytes=8 << 20, reps=3):
        dev = jax.devices()[0]
        a = np.random.default_rng(0).random(nbytes // 4, np.float32)
        puts, gets = [], []
        add = jax.jit(lambda v, s: v + s)
        x = jax.device_put(a, dev)
        np.asarray(add(x, 1.0))  # pay the first-fetch stall outside timing
        for i in range(reps):
            t0 = time.time()
            x = jax.device_put(a + i, dev)
            x.block_until_ready()
            t1 = time.time()
            np.asarray(add(x, float(i)))  # fresh result -> uncached fetch
            t2 = time.time()
            puts.append(nbytes / (t1 - t0) / 1e6)
            gets.append(nbytes / (t2 - t1) / 1e6)
        puts.sort(), gets.sort()
        return {"put_mb_s": round(puts[reps // 2], 1),
                "get_mb_s": round(gets[reps // 2], 1)}

    tunnel = _probe_tunnel()

    # --- the measured run: the real CLI over a clean output tree ---
    out_root = root / "out"
    if out_root.exists():
        shutil.rmtree(out_root)
    argv_cli = [
        "--split", str(split),
        "--lidar-dir", str(lidar_dir),
        "--bank-dir", str(bank_dir),
        "--out-root", str(out_root),
        "--modes", args.mode,
        "--rates", str(args.rate),
        "--velocities", str(args.velocity),
        "--batch", str(args.batch),
        "--no-fov-filter",  # synthetic scans are already forward-FOV
    ] + (["--wet"] if args.wet else [])
    t0 = time.time()
    rc = precompute_main(argv_cli)
    wall = time.time() - t0
    assert rc == 0

    out_dir = (
        out_root / "snowfall_simulation" / args.mode
        / f"{lidar_dir.name}_rainrate_{int(rr)}"
    )
    manifest = json.loads((out_dir / "_manifest.json").read_text())
    frames_done = manifest["stats"]["frames_done"]

    # separate jit-compile batches from steady-state ones: over the remote
    # tunnel a fresh shape costs 40-260 s even with the persistent XLA
    # cache warm, which otherwise swamps a 200-frame run
    b_rows = manifest["stats"].get("batches", [])
    clean = [b for b in b_rows if not b["compiles"]]
    steady_frames = sum(b["frames"] for b in clean)
    steady_s = sum(b["s"] for b in clean)
    compile_s = sum(b["s"] for b in b_rows if b["compiles"])
    rates = sorted(
        b["frames"] / b["s"] for b in clean if b["s"] > 0
    )

    # transfer-bound ceiling at the probed bandwidth: bytes/frame on the
    # packed surface (parallel/batched.datagen_packed_step)
    n_cap = max(n_points)
    up_bytes = n_cap * (4 * 4 + 1) + 67 * 4
    out_cap = min(-(-int(0.8 * n_cap) // 2048) * 2048, n_cap)
    down_bytes = out_cap * 4 * (5 if args.wet else 4)
    ceiling = 1e6 / (
        up_bytes / tunnel["put_mb_s"] + down_bytes / tunnel["get_mb_s"]
    )

    report = {
        "metric": "datagen_end_to_end_scans_per_sec",
        "value": round(frames_done / wall, 2),
        "unit": "scans/s",
        "frames": frames_done,
        "wall_s": round(wall, 2),
        "steady_scans_per_sec": (
            round(steady_frames / steady_s, 2) if steady_s > 0 else None
        ),
        "steady_median_scans_per_sec": (
            round(rates[len(rates) // 2], 2) if rates else None
        ),
        "steady_frames": steady_frames,
        "compile_batches_s": round(compile_s, 2),
        "tunnel": tunnel,
        "transfer_bound_ceiling_scans_per_sec": round(ceiling, 1),
        "transfer_bytes_per_frame": up_bytes + down_bytes,
        "mean_points_per_scan": int(np.mean(n_points)),
        "batch": args.batch,
        "backend": jax.default_backend(),
        "wet": args.wet,
        "manifest_stats": manifest["stats"],
        "scene_setup_s": round(t_scene, 1),
        "bank_setup_s": round(t_banks, 1),
    }
    # --- device-resident step slope (VERDICT r3 item 6): the SAME packed
    # step (identical config to the run above) slope-timed over a lax.scan
    # chain on DEVICE-RESIDENT batches — zero host<->device transfers in
    # the timed region. steady_scans_per_sec vs this number MEASURES the
    # transfer+host overhead of the full loop on this session's link; the
    # local-PCIe claim then cites (transfer_bytes / 8 GB/s) against the
    # measured device step instead of being asserted.
    import functools
    import zlib

    import jax.numpy as jnp

    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.models.snowfall import calib_device_arrays
    from lidar_snow_sim_tpu.parallel.batched import datagen_packed_step
    from lidar_snow_sim_tpu.sampling.banks import build_bank

    max_points = 1 << 16  # precompute.py default
    pch = max(max_points // 64, 256)
    cfg = SnowfallConfig(
        max_points=max_points, window_size=256, wide_capacity=128,
        max_occluders=32, max_bumps=32, point_chunk=2048, assembly="dense",
        channel_capacity=pch, block_points=max(min(128, pch // 8), 32),
        slice_width=1536,
    )  # mirrors tools/precompute.py:109-118
    sets = [
        np.load(bank_dir / f"{prefix}_{line}.npy") for line in range(1, 65)
    ]
    bank_dev = jax.device_put(build_bank(
        sets, window_size=cfg.window_size,
        wide_threshold=cfg.wide_threshold, wide_capacity=cfg.wide_capacity,
    ))
    ca = calib_device_arrays(calib)
    b = args.batch
    pts_h = np.zeros((b, max_points, 4), np.float32)
    chan_h = np.zeros((b, max_points), np.uint8)
    meta_h = np.zeros((b, 3 + 64), np.int32)
    for j in range(b):
        pc = np.fromfile(
            lidar_dir / f"2020-01-01_{j:05d}.bin", np.float32
        ).reshape(-1, 5)
        pts_h[j, : len(pc)] = pc[:, :4]
        chan_h[j, : len(pc)] = pc[:, 4].astype(np.uint8)
        r = np.random.default_rng(
            [0, zlib.crc32(f"2020-01-01_{j:05d}".encode())]
        )
        meta_h[j, 0] = len(pc)
        meta_h[j, 2] = int(r.integers(2**31))
        meta_h[j, 3:] = r.permutation(64)
    out_cap = min(-(-int(0.8 * max_points) // 2048) * 2048, max_points)
    step_fn = functools.partial(
        datagen_packed_step, snow_cfg=cfg,
        wet_cfg=None, out_points=out_cap,
    )
    pts_d = jax.device_put(jnp.asarray(pts_h))
    chan_d = jax.device_put(jnp.asarray(chan_h))
    meta_d = jax.device_put(jnp.asarray(meta_h))

    def chain(pts, chan, meta, bank_, ca_, n):
        # scalar carry perturbing the seed column + full-output dependency
        # (rows.sum()): a cloud carry pays a padded copy no real consumer
        # pays, and a partial dependency lets XLA DCE output work
        def body(eps, _):
            m = meta.at[:, 2].add(eps)
            rows, ometa = step_fn(pts, chan, m, bank_, ca_)
            nxt = eps + (rows.sum() * 0.0).astype(jnp.int32)
            return nxt, ometa[:, 1]
        _, atts = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return atts

    chain_j = jax.jit(chain, static_argnames=("n",))
    short, long_ = 2, 8
    for n in (short, long_):  # compile both shapes
        np.asarray(chain_j(pts_d, chan_d, meta_d, bank_dev, ca, n))
    t0 = time.time()
    np.asarray(chain_j(pts_d, chan_d, meta_d, bank_dev, ca, short))
    t_s = time.time() - t0
    t0 = time.time()
    np.asarray(chain_j(pts_d, chan_d, meta_d, bank_dev, ca, long_))
    t_l = time.time() - t0
    step_s = (t_l - t_s) / (long_ - short)
    dev_rate = b / step_s
    steady = report["steady_scans_per_sec"] or 0.0
    pcie_s_per_frame = (up_bytes + down_bytes) / 8e9  # PCIe gen3 x16 floor
    report["device_resident_scans_per_sec"] = round(dev_rate, 2)
    report["device_step_ms_per_frame"] = round(1e3 * step_s / b, 2)
    report["measured_loop_overhead_pct"] = (
        round(100 * (1 - steady / dev_rate), 1) if steady else None
    )
    report["pcie8gbps_overhead_pct_of_device_step"] = round(
        100 * pcie_s_per_frame / (step_s / b), 2
    )

    # resume pass: all frames skip -> measures the pure IO/walk floor
    t0 = time.time()
    precompute_main(argv_cli)
    report["resume_walk_s"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
