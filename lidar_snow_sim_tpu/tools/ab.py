"""Same-session interleaved A/B harness — THE way to compare configs on TPU.

This is the permanent home of the methodology BASELINE.md mandates for every
perf claim (round-4 "measurement honesty" lessons): absolute throughput
swings ~±15% between sessions and a single-sample slope swings >20% on one
congested tunnel RPC, so

- every arm is measured in the SAME process,
- reps are INTERLEAVED round-robin across arms (a congestion window taxes
  all arms, not one),
- the per-step time is the SLOPE between a short and a long jitted lax.scan
  chain (dispatch/transfer constants cancel), with the MEDIAN of the reps
  taken per chain endpoint,
- every step's chain dependency covers EVERY leaf of the step output (a
  partial dependency lets XLA dead-code-eliminate whole phases — verified
  by HLO dump in round 4),
- an arm with a nonzero capacity-overflow count is an INVALID comparison
  (it did less work) and fails loudly.

Usage (model first, then variant specs):

    python -m lidar_snow_sim_tpu.tools.ab snow base batch16 \
        'k16=max_occluders:16'
    python -m lidar_snow_sim_tpu.tools.ab dror windowed full
    python -m lidar_snow_sim_tpu.tools.ab lisa base 'k16=max_droplets:16'
    python -m lidar_snow_sim_tpu.tools.ab detect base batch8

Variant syntax: a bare `name` picks a predefined variant of the model; a
`name=field:value[,field:value...]` defines an override on the fly (fields
are config fields of the model's arm builder; the special field `batch`
sets the vmap batch). Values parse as int, then float, then str.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Callable, NamedTuple


class Arm(NamedTuple):
    """One A/B arm: `run(n_chain) -> (wall seconds, overflow count)`."""

    run: Callable[[int], tuple[float, int]]
    batch: int


PREDEFINED = {
    "snow": {
        "base": {},
        "batch4": {"batch": 4},
        "batch8": {"batch": 8},
        "batch16": {"batch": 16},
        "batch24": {"batch": 24},
        "batch32": {"batch": 32},
        "k16": {"max_occluders": 16},
        "route256": {"route_band": 256},
    },
    "dror": {
        # the round-4 windowed kernel at its bench parameters vs the exact
        # full-N kernel at the wrapper defaults (the round-3 baseline)
        "windowed": {"window": 2048, "margin": 1024, "block": 128},
        "full": {"window": 0, "block": 1024},
        "w4096": {"window": 4096, "margin": 1024, "block": 128},
    },
    "lisa": {
        "base": {},
        "k16": {"max_droplets": 16, "tail_droplets": 4},
        "k64": {"max_droplets": 64, "tail_droplets": 16},
    },
    "detect": {
        "base": {},
        "batch1": {"batch": 1},
        "batch8": {"batch": 8},
        "batch16": {"batch": 16},
        "f32": {"compute_dtype": "float32"},
    },
}


def _parse_value(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


def parse_variants(model: str, specs: list[str]) -> dict[str, dict]:
    """Variant specs -> {name: override dict}. See module docstring."""
    out = {}
    for spec in specs:
        if "=" in spec:
            name, fields = spec.split("=", 1)
            ov = {}
            for fv in fields.split(","):
                f, v = fv.split(":")
                ov[f] = _parse_value(v)
            out[name] = ov
        else:
            out[spec] = dict(PREDEFINED[model][spec])
    return out


def full_leaf_dep(out):
    """Scalar that depends on EVERY leaf of a step output.

    The chain carry must fold this in or XLA dead-code-eliminates the
    computation of unconsumed leaves — the round-4 trap that silently
    dropped the write-back scatters (and once the whole wet pipeline)
    from a "measured" step.
    """
    import jax
    import jax.numpy as jnp

    return sum(
        leaf.sum().astype(jnp.float32)
        for leaf in jax.tree_util.tree_leaves(out)
    )


def make_runner(step, inputs, batch: int, key_base: int = 1000):
    """Wrap a per-step function into a chain runner.

    `step(inputs, keys)` maps (the loop-invariant input tuple, a (batch,)
    stack of PRNG keys) to `(dep, ovf)` — a scalar depending on every
    output leaf and a scalar overflow count. Returns `run(n) -> (seconds,
    total overflow)` timing one jitted n-step lax.scan whose carry is a
    scalar folded into the step keys (bench.py's chain shape: inputs stay
    loop-invariant like a device-resident production batch; a cloud carry
    would pay a padded-layout copy no real consumer pays).

    Inputs are passed as jit ARGUMENTS — captured device arrays become
    MLIR constants, which forces a device->host fetch during lowering that
    fails over the remote tunnel.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def chain(inputs, keys_stacked):
        def body(eps, keys_i):
            keys_j = jax.vmap(lambda k: jax.random.fold_in(k, eps))(keys_i)
            dep, ovf = step(inputs, keys_j)
            nxt = eps + (dep * 0.0).astype(jnp.int32)
            # dep is ALSO a live per-step OUTPUT: when every output leaf
            # is bool/int, its sum is provably finite, `dep * 0.0` folds
            # to 0, and with a constant ovf the whole body becomes dead —
            # XLA DCE'd the full-N DROR arm this way (long-chain time ==
            # short-chain time; it reported 1237 "scans/s"). A fetched
            # output cannot be folded away. (Round-5 ledger, BASELINE.md.)
            return nxt, (ovf, dep)
        _, (ovfs, deps) = jax.lax.scan(body, jnp.int32(0), keys_stacked)
        return ovfs, deps

    chain_j = jax.jit(chain)

    def run(n: int):
        ks = jnp.stack(
            [jax.random.split(jax.random.PRNGKey(key_base + i), batch)
             for i in range(n)]
        )
        t0 = time.time()
        ovf, deps = chain_j(inputs, ks)
        ovf = np.asarray(ovf)        # value fetch = completion
        np.asarray(deps)
        return time.time() - t0, int(ovf.sum())

    return run


def interleaved_ab(
    arms: dict[str, Arm],
    short: int = 2,
    long_: int = 12,
    reps: int = 5,
    verbose: bool = True,
) -> dict[str, dict]:
    """Run the interleaved median-slope comparison over `arms`.

    Returns {name: {step_ms, scans_per_sec, spread_ms, overflow}}. Raises
    ValueError if any arm overflows (less work done => invalid comparison).
    """
    def say(msg):
        if verbose:
            print(msg, flush=True)

    # compile pass (also the overflow validity gate)
    for name, arm in arms.items():
        t1, _ = arm.run(short)
        t2, ovf = arm.run(long_)
        say(f"compile {name}: short {t1:.1f}s long {t2:.1f}s ovf={ovf}")
        if ovf:
            raise ValueError(
                f"arm '{name}' overflowed ({ovf}): it did less work than "
                "a valid run — fix capacities before comparing"
            )

    res = {n: {"s": [], "l": []} for n in arms}
    for r in range(reps):
        for name, arm in arms.items():
            ts, _ = arm.run(short)
            tl, ovf = arm.run(long_)
            res[name]["s"].append(ts)
            res[name]["l"].append(tl)
            say(f"rep {r} {name}: short {ts:.3f}s long {tl:.3f}s ovf={ovf}")

    out = {}
    for name, arm in arms.items():
        s = sorted(res[name]["s"])[reps // 2]
        l = sorted(res[name]["l"])[reps // 2]
        dt = (l - s) / (long_ - short)
        spread = (max(res[name]["l"]) - min(res[name]["l"])) / (long_ - short)
        out[name] = dict(
            step_ms=dt * 1e3,
            scans_per_sec=arm.batch / dt if dt > 0 else float("inf"),
            spread_ms=spread * 1e3,
            overflow=0,
        )
        say(
            f"{name}: step {dt * 1e3:.2f} ms  {arm.batch / dt:.1f} scans/s  "
            f"(long-chain spread {spread * 1e3:.2f} ms/step)"
        )
    return out


# ---- arm builders (bench.py's workload shapes) ----------------------------


def _bench_cloud():
    """The bench scan, padded, plus bank/calib device arrays (bench.py's
    exact workload so A/B numbers compose with the headline)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    jax.config.update("jax_compilation_cache_dir", str(bench.CACHE / "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=870, seed=0, calib=calib)
    max_points = 1 << int(np.ceil(np.log2(len(pc))))
    padded = pad_cloud(pc, max_points)
    return calib, pc, padded, max_points


def _broadcast(padded, batch):
    import jax.numpy as jnp

    points = jnp.broadcast_to(
        jnp.asarray(padded.points), (batch,) + padded.points.shape
    )
    mask = jnp.broadcast_to(
        jnp.asarray(padded.mask), (batch,) + padded.mask.shape
    )
    return points, mask


def build_snow_arms(variants: dict[str, dict]) -> dict[str, Arm]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.models.snowfall import (
        calib_device_arrays,
        snowfall_augment,
    )
    from lidar_snow_sim_tpu.sampling.banks import build_bank

    calib, _pc, padded, max_points = _bench_cloud()
    base = dict(
        max_points=max_points, window_size=128,
        wide_capacity=16, max_occluders=24, max_bumps=16, point_chunk=2048,
        assembly="dense", use_pallas=True, channel_capacity=1024,
        block_points=128, slice_width=1152, pulse_block=512,
        band_group=16, route_band=384, chunk_group=8,
    )
    wide_threshold = SnowfallConfig.__dataclass_fields__[
        "wide_threshold"
    ].default
    bank = jax.device_put(build_bank(
        bench.get_bank_sets(), window_size=128,
        wide_threshold=wide_threshold, wide_capacity=16,
    ))
    ca = calib_device_arrays(calib)

    arms = {}
    for name, ov in variants.items():
        ov = dict(ov)
        batch = ov.pop("batch", 16)
        cfg = SnowfallConfig(**{**base, **ov})
        points, mask = _broadcast(padded, batch)
        orders = jnp.asarray(
            np.stack([np.random.default_rng(i).permutation(64)
                      for i in range(batch)]),
            jnp.int32,
        )

        def step(inputs, keys, cfg=cfg):
            p, m, o, b, c = inputs
            out = jax.vmap(
                lambda pp, mm, oo, kk: snowfall_augment(
                    pp, mm, b, c, oo, kk, cfg
                )
            )(p, m, o, keys)
            ovf = (out.window_overflow + out.occluder_overflow
                   + out.bump_overflow + out.channel_overflow
                   + out.compact_overflow)
            return full_leaf_dep(out), jnp.sum(ovf)

        arms[name] = Arm(
            make_runner(step, (points, mask, orders, bank, ca), batch), batch
        )
    return arms


def build_dror_arms(variants: dict[str, dict]) -> dict[str, Arm]:
    import math

    import jax
    import jax.numpy as jnp

    from lidar_snow_sim_tpu.models.dror import (
        _dror_kernel,
        _dror_kernel_windowed,
    )

    _calib, _pc, padded, _mp = _bench_cloud()
    msk0 = jnp.asarray(padded.mask)

    arms = {}
    for name, ov in variants.items():
        ov = dict(ov)
        batch = ov.pop("batch", 8)
        window = ov.pop("window", 2048)
        margin = ov.pop("margin", 1024)
        block = ov.pop("block", 128 if window else 1024)
        alpha = float(ov.pop("alpha", 0.45))
        beta = float(ov.pop("beta", 3.0))
        k_min = int(ov.pop("k_min", 3))
        sr_min = float(ov.pop("sr_min", 0.04))
        if ov:
            raise ValueError(f"unknown dror fields: {sorted(ov)}")
        points, _ = _broadcast(padded, batch)
        consts = (
            jnp.float32(math.radians(alpha)), jnp.float32(beta),
            jnp.int32(k_min), jnp.float32(sr_min),
        )

        def step(inputs, keys, window=window, margin=margin, block=block):
            p, m, a, b_, k_, s_ = inputs
            # hoist guard: (key & 1) picks 0 or an f32 denormal; 1.0 +
            # either rounds to EXACTLY 1.0 (inputs bit-identical), but the
            # compiler cannot fold the data-dependent factor, so the body
            # stays inside the loop. The previous "key * 0.0" guard IS
            # foldable (u32->f32 is provably finite) and XLA hoisted the
            # full-N arm's entire body once — long-chain time equalled
            # short-chain time, the tell (round-5 ledger, BASELINE.md).
            one = jnp.float32(1.0) + (
                keys[0].ravel()[0] % 2
            ).astype(jnp.float32) * jnp.float32(1e-45)
            if window:
                keep, ovf = jax.vmap(
                    lambda pp: _dror_kernel_windowed(
                        pp[:, :3] * one, m, a, b_, k_, s_,
                        block=block, window=window, margin=margin,
                    )
                )(p)
                return full_leaf_dep((keep, ovf)), jnp.sum(ovf)
            keep = jax.vmap(
                lambda pp: _dror_kernel(
                    pp[:, :3] * one, m, a, b_, k_, s_, block=block
                )
            )(p)
            return full_leaf_dep(keep), jnp.int32(0)

        arms[name] = Arm(
            make_runner(step, (points, msk0) + consts, batch), batch
        )
    return arms


def build_lisa_arms(variants: dict[str, dict]) -> dict[str, Arm]:
    import jax
    import jax.numpy as jnp

    from lidar_snow_sim_tpu.models.lisa import LISA

    _calib, _pc, padded, _mp = _bench_cloud()
    msk0 = jnp.asarray(padded.mask)

    arms = {}
    for name, ov in variants.items():
        ov = dict(ov)
        batch = ov.pop("batch", 8)
        rr = float(ov.pop("Rr", 10.0))
        lisa_kw = {k: ov.pop(k) for k in list(ov)}
        l = LISA(**lisa_kw)
        grids = l._dsd_tables(rr)
        consts = (jnp.float32(l.alpha(rr)), jnp.float32(l.droplet_density(rr)))
        points, _ = _broadcast(padded, batch)
        points = points.at[..., 3].divide(255.0)

        def step(inputs, keys, l=l):
            p, m, al, de, *grids_ = inputs
            res = jax.vmap(
                lambda pp, kk: l._augment_core(pp, m, kk, al, de, *grids_)
            )(p, keys)
            return full_leaf_dep(res), jnp.sum(res.droplet_overflow)

        arms[name] = Arm(
            make_runner(step, (points, msk0) + consts + grids, batch), batch
        )
    return arms


def build_detect_arms(variants: dict[str, dict]) -> dict[str, Arm]:
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_snow_sim_tpu.models import pointpillars as pp

    _calib, _pc, padded, _mp = _bench_cloud()

    arms = {}
    for name, ov in variants.items():
        ov = dict(ov)
        batch = ov.pop("batch", 4)
        det_cfg = _dc.replace(
            pp.PointPillarsConfig(), nms_pre_max=1024,
            compute_dtype="bfloat16", **ov,
        )
        params = pp.init_params(det_cfg, jax.random.PRNGKey(0))
        # background-level cls logits, like bench.py's measure_detect:
        # candidate sparsity (and the overflow counter) match real scenes
        params["dense_head.conv_cls.weight"] = (
            params["dense_head.conv_cls.weight"] * 0.01
        )
        anchors = jnp.asarray(pp.generate_anchors(det_cfg))
        pts4 = np.asarray(padded.points)[:, :4].copy()
        pts4[:, 3] /= 255.0
        pts_b = jnp.broadcast_to(jnp.asarray(pts4), (batch,) + pts4.shape)
        msk_b = jnp.broadcast_to(
            jnp.asarray(padded.mask), (batch,) + padded.mask.shape
        )

        def step(inputs, keys, det_cfg=det_cfg):
            pts, msk, prm, anc = inputs
            # hoist guard — see build_dror_arms: "* (1 + key%2 * 1e-45)"
            # is bit-exact but unfoldable; "+ key * 0.0" was foldable
            one = jnp.float32(1.0) + (
                keys[0].ravel()[0] % 2
            ).astype(jnp.float32) * jnp.float32(1e-45)
            out = jax.vmap(
                lambda p, m: pp.detect(p * one, m, prm, anc, det_cfg),
                in_axes=(0, 0),
            )(pts, msk)
            return full_leaf_dep(out), (
                jnp.sum(out.nms_pre_overflow) + jnp.sum(out.prefix_overflow)
            )

        arms[name] = Arm(
            make_runner(step, (pts_b, msk_b, params, anchors), batch), batch
        )
    return arms


BUILDERS = {
    "snow": build_snow_arms,
    "dror": build_dror_arms,
    "lisa": build_lisa_arms,
    "detect": build_detect_arms,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", choices=sorted(BUILDERS))
    ap.add_argument("specs", nargs="+", help="variant specs (see module doc)")
    ap.add_argument("--short", type=int, default=2)
    ap.add_argument("--long", dest="long_", type=int, default=12)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    variants = parse_variants(args.model, args.specs)
    arms = BUILDERS[args.model](variants)
    interleaved_ab(arms, short=args.short, long_=args.long_, reps=args.reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
