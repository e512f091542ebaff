"""Device-trace profiling of the bench workload (works over the TPU tunnel).

Runs the bench-shaped snowfall step under `jax.profiler.trace`, parses the
emitted Chrome trace, and prints per-HLO-op device time — the workflow that
attributed round 2's step time (BASELINE.md). Usage:

    python -m lidar_snow_sim_tpu.tools.profile_bench [--batch 8] [--top 25]

Map the printed fusion/while names back to source with the compiled HLO:
`--dump-hlo hlo.txt` writes `compiled.as_text()`, whose metadata carries
`source_file`/`source_line` per op.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--chain", type=int, default=0,
                    help="trace a lax.scan chain of this many steps "
                         "(bench.py's slope shape) instead of raw "
                         "re-dispatches")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--dump-hlo", default=None)
    ap.add_argument("--model", default="snow",
                    choices=("snow", "lisa", "dror", "detector"),
                    help="which bench-slope workload to trace: the snowfall "
                         "core (default), a weather-baseline step shaped "
                         "exactly like bench.py's measure_weather slope, or "
                         "the PointPillars inference step (measure_detect "
                         "shape; BENCH_DETECT_DTYPE/BENCH_DETECT_BATCH "
                         "apply)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench  # repo-root bench: reuses its workload + bank cache
    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.models.snowfall import (
        calib_device_arrays,
        snowfall_augment,
    )
    from lidar_snow_sim_tpu.sampling.banks import build_bank
    from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    jax.config.update("jax_compilation_cache_dir", str(bench.CACHE / "xla"))

    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=870, seed=0, calib=calib)
    sets = bench.get_bank_sets()
    import os

    cfg = SnowfallConfig(
        max_points=1 << int(np.ceil(np.log2(len(pc)))), window_size=128,
        wide_capacity=16, max_occluders=24, max_bumps=16, point_chunk=2048,
        assembly="dense", use_pallas=True, channel_capacity=1024,
        block_points=128, slice_width=1152, chunk_group=8,
        band_width=int(os.environ.get("BENCH_BAND", "0")),
        band_group=int(os.environ.get("BENCH_BGROUP", "16")),
        route_band=int(os.environ.get("BENCH_ROUTE", "384")),
    )
    bank = jax.device_put(build_bank(
        sets, window_size=cfg.window_size,
        wide_threshold=cfg.wide_threshold, wide_capacity=cfg.wide_capacity,
    ))
    ca = calib_device_arrays(calib)
    padded = pad_cloud(pc, cfg.max_points)
    b = args.batch
    points = jnp.broadcast_to(
        jnp.asarray(padded.points), (b,) + padded.points.shape
    )
    mask = jnp.broadcast_to(jnp.asarray(padded.mask), (b,) + padded.mask.shape)
    orders = jnp.asarray(
        np.stack([np.random.default_rng(i).permutation(64) for i in range(b)]),
        jnp.int32,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    msk0 = jnp.asarray(padded.mask)
    if args.model == "lisa":
        from lidar_snow_sim_tpu.models.lisa import LISA

        l = LISA()
        grids = l._dsd_tables(10.0)
        l_alpha = jnp.float32(l.alpha(10.0))
        l_dens = jnp.float32(l.droplet_density(10.0))
        points = points.at[..., 3].divide(255.0)

        def vstep_raw(p, m, o, k, bk, c):
            res = jax.vmap(
                lambda pp, kk: l._augment_core(
                    pp, msk0, kk, l_alpha, l_dens, *grids
                )
            )(p, k)
            return res
    elif args.model == "detector":
        import dataclasses as _dc

        from lidar_snow_sim_tpu.models import pointpillars as pp

        det_cfg = _dc.replace(
            pp.PointPillarsConfig(),
            nms_pre_max=1024,
            compute_dtype=os.environ.get("BENCH_DETECT_DTYPE", "bfloat16"),
        )
        b = int(os.environ.get("BENCH_DETECT_BATCH", str(args.batch)))
        dparams = pp.init_params(det_cfg, jax.random.PRNGKey(0))
        # background-level cls logits (bench.py measure_detect): candidate
        # sparsity matches real scenes
        dparams["dense_head.conv_cls.weight"] = (
            dparams["dense_head.conv_cls.weight"] * 0.01
        )
        pts4 = np.asarray(padded.points)[:, :4].copy()
        pts4[:, 3] /= 255.0
        points = jnp.broadcast_to(jnp.asarray(pts4), (b,) + pts4.shape)
        mask = jnp.broadcast_to(
            jnp.asarray(padded.mask), (b,) + padded.mask.shape
        )
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        # params/anchors ride the `bank` argument slot: captured device
        # arrays become MLIR constants and force a device->host fetch
        # during lowering over the tunnel
        bank = {"params": dparams,
                "anchors": jnp.asarray(pp.generate_anchors(det_cfg))}

        def vstep_raw(p, m, o, k, bk, c):
            # multiplicative hoist guard: bit-exact (1 + denormal rounds
            # to 1.0) but unfoldable; "key * 0.0" IS foldable (round 5)
            one = jnp.float32(1.0) + (
                k[0].ravel()[0] % 2
            ).astype(jnp.float32) * jnp.float32(1e-45)
            return jax.vmap(
                lambda pt, mm: pp.detect(
                    pt * one, mm, bk["params"], bk["anchors"], det_cfg
                )
            )(p, m)
    elif args.model == "dror":
        import math as _m

        from lidar_snow_sim_tpu.models.dror import _dror_kernel_windowed

        def vstep_raw(p, m, o, k, bk, c):
            one = jnp.float32(1.0) + (
                k[0].ravel()[0] % 2
            ).astype(jnp.float32) * jnp.float32(1e-45)
            keep, ovf = jax.vmap(
                lambda pp: _dror_kernel_windowed(
                    pp[:, :3] * one, msk0, jnp.float32(_m.radians(0.45)),
                    jnp.float32(3.0), jnp.int32(3), jnp.float32(0.04),
                    block=128, window=2048, margin=1024,
                )
            )(p)
            # keep is (batch, N), ovf is (batch,): broadcast on a new
            # trailing axis (a bare + raised at trace time)
            return keep.astype(jnp.float32) + ovf.astype(jnp.float32)[:, None]
    else:
        vstep_raw = jax.vmap(
            lambda p, m, o, k, bk, c: snowfall_augment(p, m, bk, c, o, k, cfg),
            in_axes=(0, 0, 0, 0, None, None),
        )
    if args.chain:
        # bench.py's slope-chain shape: scan `chain` steps through a
        # value-preserving dependency, so the traced per-op times are the
        # ones the headline slope actually pays (raw re-dispatches can
        # schedule differently)
        n_chain = args.chain

        def chained(p, m, o, k, bk, c):
            # scalar carry folded into the keys + full-output dependency:
            # bench.py's round-4 chain shape (a stats-only dependency DCEs
            # the write-back scatters; a cloud carry pays a padded copy)
            def body(eps, _):
                kj = jax.vmap(lambda kk: jax.random.fold_in(kk, eps))(k)
                out = vstep_raw(p, m, o, kj, bk, c)
                # full-output dependency over every leaf (a partial dep
                # lets XLA DCE whole phases — round-4 lesson)
                dep = sum(
                    leaf.sum().astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                nxt = eps + (dep * 0.0).astype(jnp.int32)
                return nxt, dep
            _, nas = jax.lax.scan(
                body, jnp.int32(0), None, length=n_chain
            )
            return nas

        vstep = jax.jit(chained)
        div = n_chain
    else:
        vstep = jax.jit(vstep_raw)
        div = 1

    if args.dump_hlo:
        txt = vstep.lower(
            points, mask, orders, keys, bank, ca
        ).compile().as_text()
        open(args.dump_hlo, "w").write(txt)
        print(f"wrote {args.dump_hlo}")

    jax.block_until_ready(vstep(points, mask, orders, keys, bank, ca))
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="snowsim_trace_")
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(args.iters):
            out = vstep(points, mask, orders, keys, bank, ca)
        jax.block_until_ready(out)

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print(f"no trace found under {trace_dir}", file=sys.stderr)
        return 1
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, name in pids.items() if "TPU" in name or "GPU" in name}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev_pids:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    it = args.iters * div
    print(f"device ops (per step, {it} steps traced; trace: {trace_dir}):")
    for name, d in tot.most_common(args.top):
        print(f"{d / it / 1e3:9.2f} ms x{cnt[name] // it:<5d} {name[:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
