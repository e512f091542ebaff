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
# Measured knee (BASELINE.md). Batch 8 was the knee through most of round 4;
# the touched-only phase-D compaction shrank per-point work enough that 16
# now wins the same-session 3-way A/B (466.6 vs 395.2 vs 325.6 scans/s at
# 16/8/4).
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ORACLE_POINTS = int(os.environ.get("BENCH_ORACLE_POINTS", "400"))
# BENCH_SWEEP="4,8,16,32,64,128": measure every batch size, report the curve
# on stderr, and emit the best batch's throughput as the headline metric.
# NOTE: batch >= 64 reliably crashes the remote tunnel's TPU worker at bench
# shapes (BASELINE.md round-3 ledger); the sweep loop stops at the first
# crashed batch and keeps the completed rows.
SWEEP = [int(b) for b in os.environ["BENCH_SWEEP"].split(",")] if (
    os.environ.get("BENCH_SWEEP")
) else None
# BENCH_WET=1: chain wet-ground reflectance after snowfall on device (the
# viewer's snow+wet mode / datagen --wet) and benchmark the combined step.
WET = os.environ.get("BENCH_WET", "0") == "1"
# BENCH_WEATHER=1 (default): also slope-time the weather-baseline models
# (LISA, fog, STF fog, DROR — the viewer's other augmentation toggles,
# pointcloud_viewer.py:2784-2975) and report scans/s per model in the
# stderr detail. 0 skips (saves ~8 tunnel compiles).
WEATHER = os.environ.get("BENCH_WEATHER", "1") == "1"
# BENCH_DETECT=1 (default): slope-time the PointPillars inference engine
# (the viewer's run_inference surface, pointcloud_viewer.py:2388-2498) at
# the full KITTI-scale config on the bench scan; reported in the stderr
# detail. BENCH_DETECT_DTYPE=float32|bfloat16 (default bfloat16 — the MXU
# production path; decode/NMS stay f32 either way).
DETECT = os.environ.get("BENCH_DETECT", "1") == "1"
DETECT_DTYPE = os.environ.get("BENCH_DETECT_DTYPE", "bfloat16")
DETECT_BATCH = int(os.environ.get("BENCH_DETECT_BATCH", "4"))
# BENCH_DETECT_TRAIN=1 (default): slope-time the full detector TRAIN step
# (forward + backward + adam + target assignment, models/detector_train.py)
# with the state threaded through a lax.scan — real sequential dependency,
# so the slope is honest by construction.
DETECT_TRAIN = os.environ.get("BENCH_DETECT_TRAIN", "1") == "1"
DETECT_TRAIN_BATCH = int(os.environ.get("BENCH_DETECT_TRAIN_BATCH", "4"))

# v5e single-chip peaks for the roofline readout (public spec: 197 bf16
# TFLOP/s MXU, 819 GB/s HBM; VPU f32 vector throughput is ~4 TFLOP/s — the
# "few TFLOP/s" scaling-book figure — which is the relevant ceiling here
# because the hot kernels are VPU work, not matmuls). The MXU peak is the
# detector's ceiling (conv backbone); f32 convs run the MXU at half rate.
HBM_GBPS = 819.0
VPU_TFLOPS = 4.0
MXU_TFLOPS = {"bfloat16": 197.0, "float32": 98.5}


def _detector_flop_model(cfg) -> float:
    """Hand matmul/conv FLOP count per scan of the PointPillars forward at
    `cfg` (multiply-accumulate = 2 FLOPs): PFN linear, backbone convs,
    transpose-conv deblocks, 1x1 head convs. Elementwise/BN/NMS work is
    excluded — it is not MXU work, so this is the right numerator for an
    MFU readout (VERDICT r4 item 2)."""
    flops = 0.0
    # PFN: (V, P, in) x (in, C) per layer
    in_ch = 10
    for c in cfg.pfn_filters:
        flops += 2.0 * cfg.max_pillars * cfg.max_points_per_pillar * in_ch * c
        in_ch = c
    # backbone stages: one strided 3x3 conv + n 3x3 convs each
    nx, ny, _ = cfg.grid_size
    hh, ww = ny, nx
    c_in = cfg.pfn_filters[-1]
    stage_dims = []
    for n, s, c in zip(cfg.layer_nums, cfg.layer_strides, cfg.num_filters):
        hh, ww = hh // s, ww // s
        stage_dims.append((hh, ww))
        flops += 2.0 * hh * ww * 9 * c_in * c
        flops += n * 2.0 * hh * ww * 9 * c * c
        c_in = c
    # deblocks: ConvTranspose2d(k=u, stride=u) does k^2 Cin*Cout MACs per
    # INPUT cell (u >= 1); the 1/u variant is a stride-k conv
    for (hh, ww), u, c, cu in zip(
        stage_dims, cfg.upsample_strides, cfg.num_filters,
        cfg.num_upsample_filters,
    ):
        if u >= 1:
            flops += 2.0 * hh * ww * u * u * c * cu
        else:
            k = int(round(1 / u))
            flops += 2.0 * (hh // k) * (ww // k) * k * k * c * cu
    # head: three 1x1 convs over the concat map
    h, w = cfg.feature_map_size
    c_cat = sum(cfg.num_upsample_filters)
    a = cfg.num_anchors_per_loc
    out_ch = a * (len(cfg.class_names) + 7 + cfg.num_dir_bins)
    flops += 2.0 * h * w * c_cat * out_ch
    return flops


def _roofline_model(cfg, n_ch=64):
    """Analytic per-scan HBM-bytes and FLOP model of the two Pallas kernels
    (XLA's cost analysis sees them as opaque custom calls, so they are
    accounted by hand from their block shapes; the XLA-visible remainder is
    added from compiled.cost_analysis()).

    Returns dict(bytes=..., flops=...) PER SCAN. Assumptions documented
    inline; counts are order-of-magnitude-faithful, not exact.
    """
    pch = cfg.channel_capacity
    blk = cfg.block_points
    n_chunks = n_ch * pch // blk
    n2 = n_ch * pch
    k_occ = cfg.max_occluders
    w_pallas = cfg.slice_width + 128           # aligned slice width
    wc_pad = max(((cfg.wide_capacity + 127) // 128) * 128, 128)
    cand = w_pallas + wc_pad
    n_prop = 8
    n_feat = 8
    from lidar_snow_sim_tpu.models.snowfall import default_compact_capacity

    cap = cfg.compact_capacity or default_compact_capacity(cfg, n_ch)
    pblk = 512 if cap % 512 == 0 else (256 if cap % 256 == 0 else 64)
    n_pblk = cap // pblk
    m_bins = 1230

    # --- phase A (occluder selection) ---
    # routing/liveness factors: ~20% of chunks are dead spill windows
    # (skipped entirely — no DMA, no compute; round-3 device trace) and,
    # with span routing on, ~98% of live chunks take the single-band fast
    # body whose per-point candidate set is route_band + wide instead of
    # the full slice + wide (round-4 device trace). The model counts the
    # work the kernel EXECUTES under those measured fractions — without
    # them it overstates phase-A flops ~3x and the speed-of-light readout
    # is meaningless.
    live = float(os.environ.get("BENCH_MODEL_LIVE", "0.80"))
    fast = float(os.environ.get("BENCH_MODEL_FAST", "0.98")) if (
        getattr(cfg, "route_band", 0)
    ) else 0.0
    cand_fast = cfg.route_band + wc_pad
    cand_eff = fast * cand_fast + (1.0 - fast) * cand
    a_read = live * n_chunks * n_prop * cand * 4  # bank slice + wide DMA
    a_read += live * n_chunks * blk * n_feat * 4  # point features
    a_write = (4 * k_occ + 1) * n2 * 4           # a1/a2/dist/valid + ovf
    a_flops = live * n_chunks * blk * cand_eff * 45   # intersect + intervals
    a_flops += live * n_chunks * 8 * blk * cand_eff * 6  # ~8 top-k trips

    # --- phase C (sweep + pulse) ---
    c_read = cap * (4 + k_occ * 5 + (k_occ + 1) * 2) * 4   # feats+occ5+trig
    c_read += n_pblk * 2 * m_bins * 4            # grid trig tables per block
    c_write = 4 * cap * 4
    sweep_trips = 2 * 8 + 3                      # ~8 valid occluders typical
    c_flops = n_pblk * sweep_trips * pblk * (k_occ * 12)
    c_flops += n_pblk * 4 * pblk * m_bins * 8    # ~4 active bumps typical
    c_flops += cap * m_bins * 3                  # argmax + first-index

    return dict(
        bytes=a_read + a_write + c_read + c_write,
        flops=a_flops + c_flops,
        detail=dict(
            phase_a_bytes=a_read + a_write, phase_a_flops=a_flops,
            phase_c_bytes=c_read + c_write, phase_c_flops=c_flops,
        ),
    )


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
        pulse_block=int(os.environ.get("BENCH_PBLOCK", "512")),
        batch_fold=os.environ.get("BENCH_FOLD", "0") == "1",
        pallas_pair=os.environ.get("BENCH_PAIR", "0") == "1",
        pulse_pair=os.environ.get("BENCH_PPAIR", "0") == "1",
        band_width=int(os.environ.get("BENCH_BAND", "0")),
        # span-routed phase A is the round-4 default: 384-wide fast band,
        # 16-beam groups (chain-length sweep + in-chain device trace both
        # put it ~23% under the full-slice kernel; see BASELINE.md round-4
        # ledger). BENCH_ROUTE=0 restores the full-slice kernel.
        band_group=int(os.environ.get("BENCH_BGROUP", "16")),
        route_band=int(os.environ.get("BENCH_ROUTE", "384")),
        pallas_transposed=os.environ.get("BENCH_TRANSPOSED", "0") == "1",
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
    n_iters = max(int(os.environ.get("BENCH_ITERS", "10")), 2)

    def measure(batch):
        """Slope-timed scans/s at one batch size; returns a stats dict.

        Timing methodology for the remote-TPU tunnel: host-side loops are
        unreliable here (block_until_ready does not reliably block; repeated
        identical dispatches can hit an execution cache; every eager op pays
        RPC latency). So the ENTIRE measurement runs on device: one jitted
        lax.scan chains I steps through a value-preserving data dependency,
        and the per-step time is the SLOPE between a short and a long chain,
        which cancels dispatch/transfer constants.
        """
        t_b0 = time.time()
        points = jnp.broadcast_to(
            jnp.asarray(padded.points), (batch,) + padded.points.shape
        )
        mask = jnp.broadcast_to(
            jnp.asarray(padded.mask), (batch,) + padded.mask.shape
        )
        orders = jnp.asarray(
            np.stack(
                [np.random.default_rng(i).permutation(64)
                 for i in range(batch)]
            ),
            jnp.int32,
        )

        # bank/calib enter as ARGUMENTS, not closure captures: captured
        # device arrays are embedded as MLIR constants, which forces a
        # device->host fetch during lowering (fails over the remote tunnel)
        if WET:
            from lidar_snow_sim_tpu.config import WetGroundConfig
            from lidar_snow_sim_tpu.parallel.batched import snow_wet_step

            wet_cfg = WetGroundConfig(replace=False)

            def one(p, m, o, k, b, ca):
                snow, wet = snow_wet_step(p, m, b, ca, o, k, cfg, wet_cfg)
                # the wet result must feed the chain dependency or XLA
                # dead-code-eliminates the whole wet pipeline (see below)
                return snow, wet.planes.sum() + wet.num_modified.astype(
                    jnp.float32
                )
        else:
            def one(p, m, o, k, b, ca):
                return snowfall_augment(p, m, b, ca, o, k, cfg), jnp.float32(0)

        vstep = jax.vmap(one, in_axes=(0, 0, 0, 0, None, None))

        def chain(points, mask, orders, keys_stacked, b, ca):
            # Chain methodology (round-4 revision, both honesty fixes):
            # 1. The step dependency covers the FULL output (planes.sum(),
            #    one ~0.04 ms fused reduce) — a stats-only dependency let
            #    XLA dead-code-eliminate the xyz write-back scatters and,
            #    in WET mode, the ENTIRE wet pipeline (discovered via a
            #    1-scatter HLO dump).
            # 2. The carry is a SCALAR folded into the step keys — carrying
            #    the (B, N, 5) cloud itself paid a padded-layout copy every
            #    step (minor dim 5 tiles to 128 lanes = 25.6x) that no real
            #    consumer pays; inputs stay loop-invariant like a real
            #    pipelined workload's device-resident batch.
            def body(eps, keys_i):
                keys_j = jax.vmap(
                    lambda k: jax.random.fold_in(k, eps)
                )(keys_i)
                out, wet_dep = vstep(points, mask, orders, keys_j, b, ca)
                dep = out.planes.sum() + wet_dep.sum()
                nxt = eps + (dep * 0.0).astype(jnp.int32)
                return nxt, (out.num_attenuated,
                             out.window_overflow + out.occluder_overflow
                             + out.bump_overflow + out.channel_overflow
                             + out.compact_overflow)
            _, (nas, ovf) = jax.lax.scan(
                body, jnp.int32(0), keys_stacked
            )
            return nas, ovf

        chain_j = jax.jit(chain)
        short, long_ = 2, 2 + n_iters

        def run_chain(n):
            ks = jnp.stack(
                [jax.random.split(jax.random.PRNGKey(1000 + i), batch)
                 for i in range(n)]
            )
            t0 = time.time()
            nas, ovf = chain_j(points, mask, orders, ks, bank, calib_arrays)
            nas = np.asarray(nas)   # value fetch forces completion
            ovf = np.asarray(ovf)
            return time.time() - t0, nas, ovf

        run_chain(short)            # compile both shapes
        run_chain(long_)
        t_compile = time.time() - t_b0
        # median-of-REPS for BOTH endpoints: single-sample slopes were
        # demonstrated to swing an A/B by >20% when one tunnel call lands
        # on a congested window (round-4 ledger, span-routed kernel saga)
        reps = max(int(os.environ.get("BENCH_REPS", "3")), 1)
        ts_s, ts_l = [], []
        for _ in range(reps):
            t, _, _ = run_chain(short)
            ts_s.append(t)
        for _ in range(reps):
            t, _, ovf = run_chain(long_)
            ts_l.append(t)
        t_short = sorted(ts_s)[reps // 2]
        t_long = sorted(ts_l)[reps // 2]
        dt = (t_long - t_short) / (long_ - short)
        spread = (max(ts_l) - min(ts_l)) / (long_ - short)

        # XLA's own accounting of the non-Pallas portion of one chain step
        # (lowered at the already-compiled short-chain shape, so this hits
        # the jit/persistent cache instead of compiling a third shape)
        xla_cost = {}
        try:
            ks_s = jnp.stack(
                [jax.random.split(jax.random.PRNGKey(1000 + i), batch)
                 for i in range(short)]
            )
            ca = chain_j.lower(
                points, mask, orders, ks_s, bank, calib_arrays
            ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            xla_cost = {
                "flops": float(ca.get("flops", 0.0)) / short,
                "bytes": float(ca.get("bytes accessed", 0.0)) / short,
            }
        except Exception:
            pass
        return dict(
            batch=batch,
            scans_per_sec=batch / dt,
            step_ms=dt * 1e3,
            step_ms_spread=spread * 1e3,
            overflow=int(ovf.sum()),
            compile_s=t_compile,
            xla_cost=xla_cost,
        )

    def measure_weather(batch=8, iters=None):
        """Slope-timed scans/s for the weather-baseline device kernels, same
        chained-lax.scan methodology as measure() (the only trustworthy
        timing over the remote tunnel)."""
        import math as _m

        iters = iters or max(n_iters // 2, 4)
        pts0 = jnp.asarray(padded.points)
        msk0 = jnp.asarray(padded.mask)

        def slope(step, carry0):
            # scalar carry folded into the per-step keys (a cloud carry
            # pays a padded-layout copy per step); each step returns a
            # scalar that depends on its FULL output (points + counters),
            # or XLA dead-code-eliminates the output assembly (round-4 fix)
            def chain(c0, ks):
                def body(eps, k):
                    kj = jax.vmap(
                        lambda kk: jax.random.fold_in(kk, eps)
                    )(k)
                    out = step(c0, kj)
                    return eps + (out * 0.0).astype(jnp.int32), out
                _, outs = jax.lax.scan(body, jnp.int32(0), ks)
                return outs

            chain_j = jax.jit(chain)

            def run(n, reps=2):
                ks = jnp.stack(
                    [jax.random.split(jax.random.PRNGKey(50 + i), batch)
                     for i in range(n)]
                )
                ts = []
                for _ in range(reps):
                    t0 = time.time()
                    np.asarray(chain_j(carry0, ks))  # value fetch = done
                    ts.append(time.time() - t0)
                return min(ts)  # min damps tunnel stalls

            # the fastest models (STF fog ~0.07 ms/scan) need LONG chains:
            # with a fixed short/long pair the total delta can be smaller
            # than the tunnel's per-call RPC jitter and the slope goes
            # negative — grow the long chain until the delta clears a noise
            # floor (each growth pays one extra scan-chain compile)
            short, long_ = 2, 2 + iters
            t_short = run(short)
            while True:
                dt_tot = run(long_) - t_short
                if dt_tot > 0.4 or long_ >= 2048:
                    break
                long_ = 2 + (long_ - 2) * 4
            dt = max(dt_tot, 1e-9) / (long_ - short)
            return dict(
                scans_per_sec=round(batch / dt, 1),
                ms_per_scan=round(dt / batch * 1e3, 4),
                chain=long_,
            )

        carry_b = jnp.broadcast_to(pts0, (batch,) + pts0.shape)
        out = {}

        from lidar_snow_sim_tpu.models.lisa import LISA

        # capacities sized for zero droplet overflow on the bench cloud at
        # Rr=10 (probed round 5; the library default (32, 8) is smaller —
        # the host wrapper self-tunes, but a benched arm with a nonzero
        # overflow count did less work than a valid run and is INVALID,
        # so the bench runs the grown shape directly and reports the count)
        l = LISA(max_droplets=48, tail_droplets=16)
        grids = l._dsd_tables(10.0)
        l_alpha = jnp.float32(l.alpha(10.0))
        l_dens = jnp.float32(l.droplet_density(10.0))
        lisa_carry = carry_b.at[..., 3].divide(255.0)

        def lisa_step(c, k):
            res = jax.vmap(
                lambda p, kk: l._augment_core(
                    p, msk0, kk, l_alpha, l_dens, *grids
                )
            )(c, k)
            return (jnp.sum(res.num_scattered).astype(jnp.float32)
                    + jnp.sum(res.droplet_overflow).astype(jnp.float32)
                    + res.points.sum() * jnp.float32(1e-30))

        out["lisa_rain10mmh"] = slope(lisa_step, lisa_carry)
        res0 = jax.vmap(
            lambda p, kk: l._augment_core(p, msk0, kk, l_alpha, l_dens,
                                          *grids)
        )(lisa_carry, jax.vmap(jax.random.PRNGKey)(jnp.arange(batch)))
        out["lisa_rain10mmh"]["droplet_overflows"] = int(
            jnp.sum(res0.droplet_overflow)
        )

        from lidar_snow_sim_tpu.models.fog import FogParameterSet, fog_augment

        fp = FogParameterSet(alpha=0.06)

        def fog_step(c, k):
            res = jax.vmap(lambda p, kk: fog_augment(fp, p, msk0, kk))(c, k)
            return (jnp.sum(res.num_scattered).astype(jnp.float32)
                    + res.points.sum() * jnp.float32(1e-30))

        out["fog_alpha0.06"] = slope(fog_step, carry_b)

        from lidar_snow_sim_tpu.models.stf_fog import (
            BetaRadomization,
            haze_point_cloud_padded,
        )

        coeffs = BetaRadomization(beta=0.046, seed=0).coefficients()

        def stf_step(c, k):
            res = jax.vmap(
                lambda p, kk: haze_point_cloud_padded(p, msk0, coeffs, kk)
            )(c, k)
            return (jnp.sum(res.num_scattered).astype(jnp.float32)
                    + res.points.sum() * jnp.float32(1e-30))

        out["stf_fog_beta0.046"] = slope(stf_step, carry_b)

        from lidar_snow_sim_tpu.models.dror import _dror_kernel_windowed

        def dror_step(c, k):
            # DROR consumes no PRNG key: thread the key data in as a
            # multiplicative (1 + key%2 * 1e-45) factor — bit-exact
            # (1 + denormal rounds to 1.0) but UNFOLDABLE, so XLA's
            # while-loop LICM cannot hoist the kernel. The previous
            # "key * 0.0" guard IS foldable (u32->f32 provably finite)
            # and was seen hoisted (round-5 ledger, BASELINE.md).
            one = jnp.float32(1.0) + (
                k[0].ravel()[0] % 2
            ).astype(jnp.float32) * jnp.float32(1e-45)
            keep, ovf = jax.vmap(
                lambda p: _dror_kernel_windowed(
                    p[:, :3] * one, msk0, jnp.float32(_m.radians(0.45)),
                    jnp.float32(3.0), jnp.int32(3), jnp.float32(0.04),
                    block=128, window=2048, margin=1024,
                )
            )(c)
            # fold the overflow counter in so neither branch is DCE'd
            return (jnp.sum(keep) + jnp.sum(ovf)).astype(jnp.float32)

        out["dror"] = slope(dror_step, carry_b)
        # honesty check: the windowed kernel's result only stands when the
        # counted overflow is zero on the bench scan (else the host wrapper
        # would fall back to the full-N kernel and pay its time)
        _, dror_ovf = _dror_kernel_windowed(
            pts0[:, :3], msk0, jnp.float32(_m.radians(0.45)),
            jnp.float32(3.0), jnp.int32(3), jnp.float32(0.04),
            block=128, window=2048, margin=1024,
        )
        out["dror"]["window_overflows"] = int(dror_ovf)
        return out

    def measure_detect(batch=DETECT_BATCH, iters=None):
        """Slope-timed detector inference (models/pointpillars.detect) on
        the bench scan at the public KITTI PointPillars scale: 432x496
        grid, 3 classes, 12k pillars. Weights are random — every shape in
        the engine is static, so throughput is weight-independent.
        nms_pre_max is 1024 (capacity, counted overflow; with the 0.1
        score threshold real scenes stay far below it)."""
        import dataclasses as _dc

        from lidar_snow_sim_tpu.models import pointpillars as pp

        iters = iters or max(n_iters // 2, 4)
        det_cfg = _dc.replace(
            pp.PointPillarsConfig(),
            nms_pre_max=1024,
            compute_dtype=DETECT_DTYPE,
        )
        params = pp.init_params(det_cfg, jax.random.PRNGKey(0))
        # damp the random cls-head weights so logits sit at the focal-prior
        # bias (sigmoid ~0.01, like a trained detector's background): the
        # engine is fixed-shape so throughput is identical, but candidate
        # sparsity — and hence the overflow counter — matches real scenes
        params["dense_head.conv_cls.weight"] = (
            params["dense_head.conv_cls.weight"] * 0.01
        )
        anchors = jnp.asarray(pp.generate_anchors(det_cfg))
        pts4 = np.asarray(padded.points)[:, :4].copy()
        pts4[:, 3] /= 255.0
        pts_b = jnp.broadcast_to(
            jnp.asarray(pts4), (batch,) + pts4.shape
        )
        msk_b = jnp.broadcast_to(
            jnp.asarray(padded.mask), (batch,) + padded.mask.shape
        )

        def one(p, m, prm, anc):
            return pp.detect(p, m, prm, anc, det_cfg)

        vdet = jax.vmap(one, in_axes=(0, 0, None, None))

        def chain(pts, msk, prm, anc, n):
            # scalar carry threaded through the FIRST layer's weights (an
            # exact +0.0, so outputs are unchanged): a cloud carry paid a
            # padded (B, N, 4) copy per step, and everything downstream of
            # the PFN now depends on the carry so XLA's while-loop LICM
            # cannot hoist the network. The dependency covers boxes and
            # labels too, not just scores (DCE honesty, round 4).
            w0_name = "vfe.pfn_layers.0.linear.weight"

            def body(eps, _):
                prm2 = dict(prm)
                # multiplicative hoist guard (see dror_step): bit-exact,
                # unfoldable; the old "+ eps * 0" form is foldable
                prm2[w0_name] = prm[w0_name] * (
                    jnp.float32(1.0)
                    + (eps % 2).astype(jnp.float32) * jnp.float32(1e-45)
                )
                out = vdet(pts, msk, prm2, anc)
                dep = (jnp.sum(out.scores) + jnp.sum(out.boxes)
                       + jnp.sum(out.labels).astype(jnp.float32))
                nxt = eps + (dep * 0.0).astype(jnp.int32)
                return nxt, (out.count, out.nms_pre_overflow)
            _, (cnt, ovf) = jax.lax.scan(
                body, jnp.int32(0), None, length=n
            )
            return cnt, ovf

        chain_j = jax.jit(chain, static_argnames=("n",))
        short, long_ = 2, 2 + iters

        def run(n, reps=2):
            ts = []
            for _ in range(reps):
                t0 = time.time()
                cnt, ovf = chain_j(pts_b, msk_b, params, anchors, n)
                np.asarray(cnt)
                ovf = np.asarray(ovf)
                ts.append(time.time() - t0)
            return min(ts), ovf

        t_short, _ = run(short)
        dt_tot, ovf = run(long_)
        dt_tot -= t_short
        while dt_tot < 0.4 and long_ < 512:
            long_ = 2 + (long_ - 2) * 4
            dt_tot, ovf = run(long_)
            dt_tot = dt_tot - t_short
        dt = max(dt_tot, 1e-9) / (long_ - short)
        # MFU readout (VERDICT r4 item 2): hand conv/matmul FLOPs vs the
        # MXU peak at the compute dtype
        flops = _detector_flop_model(det_cfg)
        mxu_peak = MXU_TFLOPS.get(DETECT_DTYPE, MXU_TFLOPS["float32"])
        return {
            "scans_per_sec": round(batch / dt, 1),
            "ms_per_scan": round(dt / batch * 1e3, 3),
            "batch": batch,
            "dtype": DETECT_DTYPE,
            "grid": list(det_cfg.grid_size),
            "nms_pre_overflow": int(ovf.sum()),
            "chain": long_,
            "model_gflops_per_scan": round(flops / 1e9, 2),
            "achieved_tflops": round(flops * batch / dt / 1e12, 3),
            "mfu": round(flops * (batch / dt) / (mxu_peak * 1e12), 4),
            "speed_of_light_ms_per_scan": round(
                flops / (mxu_peak * 1e12) * 1e3, 3
            ),
        }

    def measure_detect_train(batch=DETECT_TRAIN_BATCH, iters=None):
        """Slope-timed detector train step (forward + backward + adam +
        AxisAlignedTargetAssigner) on the bench scan with synthetic GT
        boxes. The TrainState is the lax.scan carry, so successive steps
        have a true data dependency and the slope cannot overlap them."""
        import dataclasses as _dc

        from lidar_snow_sim_tpu.models import detector_train as dtr
        from lidar_snow_sim_tpu.models import pointpillars as pp

        iters = iters or max(n_iters // 4, 2)
        det_cfg = _dc.replace(
            pp.PointPillarsConfig(), compute_dtype=DETECT_DTYPE
        )
        params = pp.init_params(det_cfg, jax.random.PRNGKey(0))
        anchors = pp.generate_anchors(det_cfg)
        step, init_state = dtr.make_train_step(det_cfg, anchors)
        state0 = init_state(params)

        pts4 = np.asarray(padded.points)[:, :4].copy()
        pts4[:, 3] /= 255.0
        pts_b = jnp.broadcast_to(jnp.asarray(pts4), (batch,) + pts4.shape)
        msk_b = jnp.broadcast_to(
            jnp.asarray(padded.mask), (batch,) + padded.mask.shape
        )
        # synthetic GT: 24 valid boxes per frame inside the range
        rng = np.random.default_rng(7)
        r = det_cfg.point_cloud_range
        g = 24
        gt = np.zeros((batch, 32, 8), np.float32)
        gt[:, :g, 0] = rng.uniform(r[0] + 5, r[3] - 5, (batch, g))
        gt[:, :g, 1] = rng.uniform(r[1] + 5, r[4] - 5, (batch, g))
        gt[:, :g, 2] = rng.uniform(-1.8, 0.0, (batch, g))
        gt[:, :g, 3:6] = [4.0, 1.8, 1.6]
        gt[:, :g, 6] = rng.uniform(-np.pi, np.pi, (batch, g))
        gt[:, :g, 7] = rng.integers(1, 4, (batch, g))
        gt_b = jnp.asarray(gt)

        def chain(state, n):
            def body(c, _):
                c2, metrics = step(c, pts_b, msk_b, gt_b)
                return c2, metrics["loss"]
            return jax.lax.scan(body, state, None, length=n)

        chain_j = jax.jit(chain, static_argnames=("n",))
        short, long_ = 1, 1 + iters

        def run(n, reps=2):
            ts = []
            for _ in range(reps):
                t0 = time.time()
                out_state, losses = chain_j(state0, n)
                loss = float(np.asarray(losses)[-1])
                jax.block_until_ready(out_state.params)
                ts.append(time.time() - t0)
            return min(ts), loss

        t_short, _ = run(short)
        dt_tot, loss = run(long_)
        dt_tot -= t_short
        while dt_tot < 0.4 and long_ < 256:
            long_ = 1 + (long_ - 1) * 4
            dt_tot, loss = run(long_)
            dt_tot = dt_tot - t_short
        dt = max(dt_tot, 1e-9) / (long_ - short)
        # train MFU: forward + backward ~ 3x the forward conv FLOPs (the
        # standard fwd:bwd=1:2 matmul accounting); target assignment/optax
        # are excluded (not MXU work)
        flops3 = 3.0 * _detector_flop_model(det_cfg)
        mxu_peak = MXU_TFLOPS.get(DETECT_DTYPE, MXU_TFLOPS["float32"])
        return {
            "steps_per_sec": round(1.0 / dt, 2),
            "scans_per_sec": round(batch / dt, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "batch": batch,
            "dtype": DETECT_DTYPE,
            "final_loss": round(loss, 4),
            "chain": long_,
            "model_gflops_per_scan_fwd_bwd": round(flops3 / 1e9, 2),
            "mfu": round(flops3 * (batch / dt) / (mxu_peak * 1e12), 4),
        }

    sweep_rows = []
    if SWEEP:
        for b in SWEEP:
            try:
                row = measure(b)
            except Exception as e:  # e.g. HBM OOM at the largest batches
                sweep_rows.append(dict(batch=b, error=str(e)[:600]))
                print(
                    json.dumps({"sweep": {"batch": b, "error": str(e)[:600]}}),
                    file=sys.stderr,
                )
                if "UNAVAILABLE" in str(e):
                    break  # TPU worker crashed; later batches can't run
                continue
            sweep_rows.append(row)
            print(
                json.dumps(
                    {"sweep": {k: (round(v, 3) if isinstance(v, float) else v)
                               for k, v in row.items() if k != "xla_cost"}}
                ),
                file=sys.stderr,
            )
        # an overflowing config produces WRONG (truncated) results and
        # nonsense timings — never let it win the sweep
        clean = [r for r in sweep_rows
                 if "scans_per_sec" in r and r["overflow"] == 0]
        best = max(
            clean or [r for r in sweep_rows if "scans_per_sec" in r],
            key=lambda r: r["scans_per_sec"],
        )
    else:
        best = measure(BATCH)

    weather = {}
    if WEATHER:
        try:
            weather = measure_weather()
        except Exception as e:  # noqa: BLE001 — weather detail is best-effort
            weather = {"error": str(e)[:400]}

    detector = {}
    if DETECT:
        try:
            detector = measure_detect()
        except Exception as e:  # noqa: BLE001 — detector detail is best-effort
            detector = {"error": str(e)[:400]}
    detector_train = {}
    if DETECT_TRAIN:
        try:
            detector_train = measure_detect_train()
        except Exception as e:  # noqa: BLE001 — best-effort detail
            detector_train = {"error": str(e)[:400]}

    scans_per_sec = best["scans_per_sec"]
    points_per_sec = scans_per_sec * len(pc)
    overflow = best["overflow"]

    # CPU oracle baseline (literal reference semantics), subsampled + scaled
    from lidar_snow_sim_tpu.oracle.snowfall import augment as augment_oracle

    sub_idx = np.random.default_rng(0).choice(
        len(pc), size=min(ORACLE_POINTS, len(pc)), replace=False
    )
    sub = pc[np.sort(sub_idx)]
    order0 = np.random.default_rng(0).permutation(64)
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

    # --- roofline / utilization readout ------------------------------------
    model = _roofline_model(cfg)
    xla = best.get("xla_cost") or {}
    # chain cost covers 1 scan-step of batch B; normalize per scan
    xla_bytes = xla.get("bytes", 0.0) / max(best["batch"], 1)
    xla_flops = xla.get("flops", 0.0) / max(best["batch"], 1)
    bytes_per_scan = model["bytes"] + xla_bytes
    flops_per_scan = model["flops"] + xla_flops
    achieved_gbps = scans_per_sec * bytes_per_scan / 1e9
    achieved_gflops = scans_per_sec * flops_per_scan / 1e9
    hbm_util = achieved_gbps / HBM_GBPS
    vpu_util = achieved_gflops / (VPU_TFLOPS * 1e3)
    # speed-of-light step time if each resource were saturated alone
    sol_bw_ms = bytes_per_scan / (HBM_GBPS * 1e9) * 1e3
    sol_vpu_ms = flops_per_scan / (VPU_TFLOPS * 1e12) * 1e3

    result = {
        "metric": "augmented_scans_per_sec_snow2.5mmh"
        + ("_wet" if WET else ""),
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / oracle_scans_per_sec, 1),
    }
    if overflow:
        # flag an invalid configuration in the headline line itself
        result["capacity_overflows"] = overflow
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "points_per_scan": len(pc),
                    "points_per_sec": round(points_per_sec),
                    "batch": best["batch"],
                    "step_ms": round(best["step_ms"], 2),
                    "compile_s": round(best["compile_s"], 1),
                    "setup_to_first_result_s": round(time.time() - t_setup, 1),
                    "oracle_scans_per_sec_extrapolated": round(
                        oracle_scans_per_sec, 5
                    ),
                    "oracle_subsample": len(sub),
                    "capacity_overflows": overflow,
                    "backend": jax.default_backend(),
                    "particles_per_channel_mean": int(
                        np.mean([len(s) for s in sets])
                    ),
                    "roofline": {
                        "bytes_per_scan_mb": round(bytes_per_scan / 1e6, 1),
                        "flops_per_scan_g": round(flops_per_scan / 1e9, 2),
                        "pallas_model_mb": round(model["bytes"] / 1e6, 1),
                        "pallas_model_gflop": round(model["flops"] / 1e9, 2),
                        "xla_visible_mb": round(xla_bytes / 1e6, 1),
                        "xla_visible_gflop": round(xla_flops / 1e9, 2),
                        "achieved_gb_per_s": round(achieved_gbps, 1),
                        "achieved_gflop_per_s": round(achieved_gflops, 1),
                        "hbm_utilization": round(hbm_util, 4),
                        "vpu_utilization": round(vpu_util, 4),
                        "speed_of_light_ms_per_scan": round(
                            max(sol_bw_ms, sol_vpu_ms), 3
                        ),
                        "actual_ms_per_scan": round(
                            best["step_ms"] / best["batch"], 2
                        ),
                    },
                    "weather_models": weather or None,
                    "detector_pointpillars": detector or None,
                    "detector_train": detector_train or None,
                    "sweep": [
                        {k: (round(v, 3) if isinstance(v, float) else v)
                         for k, v in r.items() if k != "xla_cost"}
                        for r in sweep_rows
                    ] or None,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
