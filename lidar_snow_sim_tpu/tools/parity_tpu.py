"""Run the exact-or-boundary device/oracle parity harness ON THE DEVICE
BACKEND (the tunnel TPU by default) and write a checked-in artifact.

The CPU-backend harness (tests/test_snowfall_parity.py) is exact; TPU f32
(fma contraction, reduction order, transcendental ULPs) can shift decision
boundaries the CPU run never sees (VERDICT r2 weak #5). This tool runs the
SAME scene through both the window and the dense+Pallas assemblies on the
real chip, classifies every mismatch with the margin machinery
(oracle/parity.py), and records counts in PARITY_TPU.json.

Usage:  python -m lidar_snow_sim_tpu.tools.parity_tpu [out.json]
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np


def build_scene():
    """The parity scene of tests/test_snowfall_parity.py (same seeds)."""
    from lidar_snow_sim_tpu.calib import load_hdl64_calib
    from lidar_snow_sim_tpu.config import SnowfallConfig
    from lidar_snow_sim_tpu.sampling.banks import build_bank
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=100, seed=1, calib=calib)
    pc = pc[np.argsort(pc[:, 4], kind="stable")]

    rng = np.random.default_rng(11)
    sets = []
    for _ in range(64):
        ang = rng.uniform(0, 2 * np.pi, 250)
        d = np.sqrt(rng.uniform(0.01, 1, 250)) * 60
        r = rng.uniform(0.005, 0.05, 250)
        sets.append(np.column_stack([d * np.cos(ang), d * np.sin(ang), r]))

    cfg = SnowfallConfig(
        max_points=1 << int(np.ceil(np.log2(len(pc)))),
        window_size=256,
        wide_capacity=64,
        max_occluders=48,
        max_bumps=24,
        point_chunk=256,
    )
    bank = build_bank(
        sets,
        window_size=cfg.window_size,
        wide_threshold=cfg.wide_threshold,
        wide_capacity=cfg.wide_capacity,
    )
    order = np.random.default_rng(3).permutation(64)
    return calib, pc, sets, bank, order, cfg


def main(out_path: str = "PARITY_TPU.json") -> int:
    import jax
    import jax.numpy as jnp

    from lidar_snow_sim_tpu.models.snowfall import (
        calib_device_arrays,
        snowfall_augment,
    )
    from lidar_snow_sim_tpu.oracle.parity import classify_parity
    from lidar_snow_sim_tpu.oracle.snowfall import augment as augment_oracle
    from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

    beam_div_deg = float(np.degrees(3e-3))
    w = np.array([0.005, -0.003, -1.0])
    plane = (w / np.linalg.norm(w), -1.55)

    calib, pc, sets, bank, order, cfg = build_scene()
    stats_o, _ = augment_oracle(
        pc.astype(np.float64), sets, calib, order, beam_div_deg,
        plane=plane, device_semantics=True,
    )

    padded = pad_cloud(pc, cfg.max_points)
    bank_dev = jax.device_put(bank)
    calib_arrays = calib_device_arrays(calib)
    n = len(pc)

    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "points": n,
        "oracle_stats": dict(
            num_attenuated=int(stats_o[0]), num_removed=int(stats_o[1]),
            avg_intensity_diff=int(stats_o[2]),
        ),
        "assemblies": {},
    }

    variants = {
        "window": cfg,
        "dense_pallas": dataclasses.replace(
            cfg, assembly="dense", channel_capacity=128, block_points=32,
            slice_width=384, chunk_group=8, use_pallas=True,
        ),
        # the round-4 bench default: span-routed kernel. route_band=128
        # (vs slice 384) forces a MIX of fast-banded and full-slice chunks
        # so both gated bodies run on the real chip (Mosaic lowering can
        # differ from the CPU interpret-mode test)
        "dense_pallas_routed": dataclasses.replace(
            cfg, assembly="dense", channel_capacity=128, block_points=32,
            slice_width=384, chunk_group=8, use_pallas=True,
            route_band=128, band_group=8,
        ),
    }
    for name, vcfg in variants.items():
        res = jax.device_get(
            jax.jit(snowfall_augment, static_argnames=("cfg",))(
                jnp.asarray(padded.points),
                jnp.asarray(padded.mask),
                bank_dev,
                calib_arrays,
                jnp.asarray(order, jnp.int32),
                jax.random.PRNGKey(0),
                vcfg,
                plane=(jnp.asarray(plane[0], jnp.float32),
                       jnp.float32(plane[1])),
            )
        )
        overflows = dict(
            window=int(res.window_overflow),
            occluder=int(res.occluder_overflow),
            bump=int(res.bump_overflow),
            channel=int(res.channel_overflow),
            compact=int(res.compact_overflow),
        )
        cls = classify_parity(
            pc, np.asarray(res.planes).T[:n], sets, calib, order,
            beam_div_deg,
        )
        report["assemblies"][name] = dict(
            overflows=overflows,
            device_stats=dict(
                num_attenuated=int(res.num_attenuated),
                num_removed=int(res.num_removed),
                avg_intensity_diff=int(res.avg_intensity_diff),
            ),
            total=cls["total"],
            num_mismatches=len(cls["mismatches"]),
            num_unexplained=len(cls["unexplained"]),
            mismatch_rate=round(cls["mismatch_rate"], 6),
            boundary_examples=cls["mismatches"][:5],
            unexplained_examples=cls["unexplained"][:5],
        )
        print(
            f"{name}: {len(cls['mismatches'])}/{cls['total']} boundary-tied,"
            f" {len(cls['unexplained'])} unexplained, overflows={overflows}"
        )

    ok = all(
        a["num_unexplained"] == 0 and a["mismatch_rate"] < 0.002
        and not any(a["overflows"].values())
        for a in report["assemblies"].values()
    )
    report["ok"] = bool(ok)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"parity_tpu {'ok' if ok else 'FAILED'} -> {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
