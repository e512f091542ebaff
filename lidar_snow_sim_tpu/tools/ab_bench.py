"""Same-session interleaved A/B of snowfall bench variants on the TPU.

The ONLY trustworthy way to compare two configurations over the remote
tunnel (BASELINE.md "measurement honesty"): absolute throughput swings
~±15% between sessions and a single-sample slope swings >20% on one
congested RPC, so every variant must be measured in the SAME process,
with its reps INTERLEAVED round-robin, and the slope taken from the
median of the reps per chain endpoint. This tool packages the harness
that drove the round-4 knee/compaction decisions (it found the batch
knee moving 8 -> 16 after the touched-only phase-D compaction).

    python -m lidar_snow_sim_tpu.tools.ab_bench                # all variants
    python -m lidar_snow_sim_tpu.tools.ab_bench base,batch16   # a subset
    python -m lidar_snow_sim_tpu.tools.ab_bench base 'k16=max_occluders:16'

Variant syntax: `name` picks a predefined variant; `name=field:value[,f:v...]`
defines a SnowfallConfig override on the fly; `name=batch:N` (alone or with
config fields) sets the vmap batch. Every arm asserts zero capacity
overflows — an overflowing arm is an INVALID comparison (it did less work).

Chain methodology mirrors bench.py: a jitted lax.scan whose carry folds a
full-output dependency back into the keys (a stats-only carry lets XLA DCE
the write-back scatters — verified with an HLO dump in round 4).
"""

from __future__ import annotations

import sys
import time

import numpy as np


PREDEFINED = {
    "base": {},
    "batch4": {"batch": 4},
    "batch16": {"batch": 16},
    "batch24": {"batch": 24},
    "batch32": {"batch": 32},
    "k16": {"max_occluders": 16},
    "route256": {"route_band": 256},
}


def parse_variants(specs):
    out = {}
    for spec in specs:
        if "=" in spec:
            name, fields = spec.split("=", 1)
            ov = {}
            for fv in fields.split(","):
                f, v = fv.split(":")
                ov[f] = float(v) if "." in v else int(v)
            out[name] = ov
        else:
            out[spec] = dict(PREDEFINED[spec])
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    specs = argv[0].split(",") if argv else list(PREDEFINED)[:3]
    variants = parse_variants(specs)

    import jax
    import jax.numpy as jnp

    import bench
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=870, seed=0, calib=calib)
    sets = bench.get_bank_sets()
    base = dict(
        max_points=1 << int(np.ceil(np.log2(len(pc)))), window_size=128,
        wide_capacity=16, max_occluders=24, max_bumps=16, point_chunk=2048,
        assembly="dense", use_pallas=True, channel_capacity=1024,
        block_points=128, slice_width=1152, pulse_block=512,
        band_group=16, route_band=384, chunk_group=8,
    )
    bank = jax.device_put(build_bank(
        sets, window_size=128, wide_threshold=5e-3, wide_capacity=16,
    ))
    ca = calib_device_arrays(calib)
    padded = pad_cloud(pc, base["max_points"])

    def make_data(batch):
        points = jnp.broadcast_to(jnp.asarray(padded.points),
                                  (batch,) + padded.points.shape)
        mask = jnp.broadcast_to(jnp.asarray(padded.mask),
                                (batch,) + padded.mask.shape)
        orders = jnp.asarray(
            np.stack([np.random.default_rng(i).permutation(64)
                      for i in range(batch)]),
            jnp.int32,
        )
        return points, mask, orders

    def make_chain(cfg):
        vstep = jax.vmap(
            lambda p, m, o, k, b, c: snowfall_augment(p, m, b, c, o, k, cfg),
            in_axes=(0, 0, 0, 0, None, None),
        )

        def chain(points, mask, orders, keys_stacked, b, c):
            def body(eps, keys_i):
                keys_j = jax.vmap(lambda k: jax.random.fold_in(k, eps))(keys_i)
                out = vstep(points, mask, orders, keys_j, b, c)
                dep = out.planes.sum()  # FULL-output dep: no DCE
                nxt = eps + (dep * 0.0).astype(jnp.int32)
                return nxt, (out.num_attenuated,
                             out.window_overflow + out.occluder_overflow
                             + out.bump_overflow + out.channel_overflow
                             + out.compact_overflow)
            _, (nas, ovf) = jax.lax.scan(body, jnp.int32(0), keys_stacked)
            return nas, ovf

        return jax.jit(chain)

    chains = {}
    for name, ov in variants.items():
        batch = ov.pop("batch", 8)
        cfg = SnowfallConfig(**{**base, **ov})
        chains[name] = (make_chain(cfg), batch, make_data(batch))

    def run(entry, n):
        chain_j, batch, (points, mask, orders) = entry
        ks = jnp.stack([jax.random.split(jax.random.PRNGKey(1000 + i), batch)
                        for i in range(n)])
        t0 = time.time()
        _, ovf = chain_j(points, mask, orders, ks, bank, ca)
        ovf = np.asarray(ovf)  # forces the fetch = forces completion
        return time.time() - t0, int(ovf.sum())

    short, long_ = 2, 12
    for name, cj in chains.items():
        t, _ = run(cj, short)
        t2, ovf = run(cj, long_)
        print(f"compile {name}: short {t:.1f}s long {t2:.1f}s ovf={ovf}",
              flush=True)
        assert ovf == 0, f"{name}: overflowing arm — comparison invalid"

    reps = 5
    res = {n: {"s": [], "l": []} for n in chains}
    for r in range(reps):
        for name, cj in chains.items():
            ts, _ = run(cj, short)
            tl, ovf = run(cj, long_)
            res[name]["s"].append(ts)
            res[name]["l"].append(tl)
            print(f"rep {r} {name}: short {ts:.3f}s long {tl:.3f}s "
                  f"ovf={ovf}", flush=True)

    for name in chains:
        b = chains[name][1]
        s = sorted(res[name]["s"])[reps // 2]
        l = sorted(res[name]["l"])[reps // 2]
        dt = (l - s) / (long_ - short)
        print(f"{name}: step {dt * 1e3:.2f} ms  {b / dt:.1f} scans/s  "
              f"(spread long {max(res[name]['l']) - min(res[name]['l']):.3f}s)")


if __name__ == "__main__":
    main()
