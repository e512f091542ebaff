"""One-off A/B: snowfall config variants, same-session interleaved slopes.

bench.py methodology: median of reps per endpoint, full-output dependency,
scalar carry. Variants vs the current default (touched-only phase D).
"""
import sys
import time

import numpy as np
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
variants = {
    "base": (SnowfallConfig(**base), 8),
    "k16": (SnowfallConfig(**{**base, "max_occluders": 16}), 8),
    "route256": (SnowfallConfig(**{**base, "route_band": 256}), 8),
    "batch16": (SnowfallConfig(**base), 16),
    "batch4": (SnowfallConfig(**base), 4),
    "batch24": (SnowfallConfig(**base), 24),
    "batch32": (SnowfallConfig(**base), 32),
}
if len(sys.argv) > 1:
    names = sys.argv[1].split(",")
    variants = {k: v for k, v in variants.items() if k in names}

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
            dep = out.planes.sum()
            nxt = eps + (dep * 0.0).astype(jnp.int32)
            return nxt, (out.num_attenuated,
                         out.window_overflow + out.occluder_overflow
                         + out.bump_overflow + out.channel_overflow
                         + out.compact_overflow)
        _, (nas, ovf) = jax.lax.scan(body, jnp.int32(0), keys_stacked)
        return nas, ovf

    return jax.jit(chain)


def run(entry, n):
    chain_j, batch, (points, mask, orders) = entry
    ks = jnp.stack([jax.random.split(jax.random.PRNGKey(1000 + i), batch)
                    for i in range(n)])
    t0 = time.time()
    nas, ovf = chain_j(points, mask, orders, ks, bank, ca)
    nas = np.asarray(nas)
    ovf = np.asarray(ovf)
    return time.time() - t0, int(ovf.sum())


short, long_ = 2, 12
chains = {
    name: (make_chain(cfg), b, make_data(b))
    for name, (cfg, b) in variants.items()
}
for name, cj in chains.items():
    t, _ = run(cj, short)
    t2, ovf = run(cj, long_)
    print(f"compile {name}: short {t:.1f}s long {t2:.1f}s ovf={ovf}",
          flush=True)

reps = 5
res = {n: {"s": [], "l": []} for n in chains}
for r in range(reps):
    for name, cj in chains.items():
        ts, _ = run(cj, short)
        tl, ovf = run(cj, long_)
        res[name]["s"].append(ts)
        res[name]["l"].append(tl)
        print(f"rep {r} {name}: short {ts:.3f}s long {tl:.3f}s ovf={ovf}",
              flush=True)

for name in chains:
    b = chains[name][1]
    s = sorted(res[name]["s"])[reps // 2]
    l = sorted(res[name]["l"])[reps // 2]
    dt = (l - s) / (long_ - short)
    print(f"{name}: step {dt * 1e3:.2f} ms  {b / dt:.1f} scans/s  "
          f"(spread long {max(res[name]['l']) - min(res[name]['l']):.3f}s)")
