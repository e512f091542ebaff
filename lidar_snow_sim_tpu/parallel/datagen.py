"""Offline dataset generation: batched, sharded, resumable.

TPU-native replacement for the reference's serial datagen driver
(`tools/snowfall/precompute.py:47-106`): instead of one scan at a time through
a 64-thread pool, scans are padded to a fixed capacity, batched, vmapped, and
(optionally) sharded over a device mesh; outputs are compacted on host and
written as STF-format .bin files with the reference's idempotent
skip-if-exists resume semantics.

Directory layout matches the reference so augmented clouds drop into
OpenPCDet training unchanged:
  {out_root}/snowfall_simulation/{mode}/{lidar_folder}_rainrate_{int(rr)}/{id}.bin
"""

from __future__ import annotations

import dataclasses
import logging
import time
import zlib
from pathlib import Path
from typing import Callable, Iterable, Sequence

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DatagenStats:
    frames_done: int = 0
    frames_skipped: int = 0
    frames_failed: int = 0
    points_in: int = 0
    points_out: int = 0
    points_dropped: int = 0   # residual input points dropped (always 0 now
    # that max_points auto-grows; kept as the honest counter)
    capacity_growths: int = 0  # recompiles triggered by capacity growth
    attenuated: int = 0
    removed: int = 0
    wall_s: float = 0.0
    # per-batch wall clocks {frames, s, compiles}: over the remote-TPU
    # tunnel a fresh jit shape costs 40-260 s even with the persistent
    # XLA cache warm, so end-to-end throughput is only interpretable with
    # compile batches separated from steady-state batches
    batches: list = dataclasses.field(default_factory=list)

    def as_dict(self):
        return dataclasses.asdict(self)

    def steady_scans_per_sec(self):
        """Throughput over batches that paid no compile; None if every
        batch compiled."""
        clean = [b for b in self.batches if not b["compiles"]]
        frames = sum(b["frames"] for b in clean)
        secs = sum(b["s"] for b in clean)
        return (frames / secs) if secs > 0 else None

    def steady_median_scans_per_sec(self):
        """Median per-batch throughput over compile-free batches — robust
        to the remote tunnel's multi-second RPC stalls (BASELINE.md), which
        land on individual batches and skew the mean."""
        clean = [b["frames"] / b["s"] for b in self.batches
                 if not b["compiles"] and b["s"] > 0]
        if not clean:
            return None
        clean.sort()
        return clean[len(clean) // 2]


def run_snowfall_datagen(
    sample_ids: Sequence[str],
    load_fn: Callable[[str], np.ndarray],
    out_dir: str | Path,
    bank,
    calib,
    snow_cfg,
    batch: int = 8,
    seed: int = 0,
    shuffle_channels: bool = True,
    fov_filter=None,
    overwrite: bool = False,
    mesh=None,
    wet_cfg=None,
    out_frac: float = 0.8,
    pipeline_depth: int = 3,
) -> DatagenStats:
    """Augment every sample id and write `{out_dir}/{id}.bin`.

    load_fn maps a sample id to an (N, 5) float32 scan (typically
    utils.load_velodyne_bin of the STF lidar folder). Existing outputs are
    skipped (resume semantics, precompute.py:91-92). Oversized scans GROW
    max_points (rounded up to a point_chunk multiple) and recompile — the
    reference never drops points (precompute.py:96-106) and neither does
    this driver; any residual drop would be counted in stats.points_dropped.

    With a `mesh` (parallel.mesh.make_mesh), the batch is sharded
    frames-over-'data' and points-over-'beam' via the GSPMD step
    (parallel.batched.make_sharded_step); batch must be a multiple of the
    mesh's data axis. With a `wet_cfg` (WetGroundConfig), wet-ground
    reflectance is chained after snowfall on device (the viewer's snow+wet
    mode, pointcloud_viewer.py:2804-2840).

    `out_frac` sizes the device->host output capacity as a fraction of
    max_points (kept rows are compacted to the front on device; removed
    points never travel back). A frame keeping more than the capacity is
    COUNTED (out_overflow), the capacity grows to max_points, and the batch
    reruns — outputs are never silently truncated.

    A `_manifest.json` with the run stats is written next to the outputs.
    """
    import jax

    from lidar_snow_sim_tpu.models.snowfall import calib_device_arrays
    from lidar_snow_sim_tpu.parallel.batched import (
        datagen_packed_step,
        make_sharded_packed_step,
    )

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stats = DatagenStats()
    t_start = time.time()

    calib_arrays = calib_device_arrays(calib)
    bank_dev = jax.device_put(bank)

    def default_out_points(cfg):
        cap = -(-int(out_frac * cfg.max_points) // 2048) * 2048
        return min(cap, cfg.max_points)

    out_points = default_out_points(snow_cfg)

    def build_step(cfg, out_pts):
        if mesh is not None:
            if batch % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch {batch} not divisible by mesh data axis "
                    f"{mesh.shape['data']}"
                )
            sharded = make_sharded_packed_step(
                mesh, cfg, wet_cfg=wet_cfg, out_points=out_pts
            )
            return lambda p, ch, meta: sharded(
                p, ch, meta, bank_dev, calib_arrays
            )
        import functools

        jitted = jax.jit(
            functools.partial(
                datagen_packed_step,
                snow_cfg=cfg,
                wet_cfg=wet_cfg,
                out_points=out_pts,
            )
        )
        return lambda p, ch, meta: jitted(
            p, ch, meta, bank=bank_dev, calib_arrays=calib_arrays
        )

    step = build_step(snow_cfg, out_points)

    _OVF = (
        "window_overflow", "occluder_overflow", "bump_overflow",
        "channel_overflow", "compact_overflow", "out_overflow",
    )  # out_meta columns 4..9, in this order (datagen_packed_step)
    k_ext = int(np.asarray(bank.angle).shape[1])

    def grow_cfg(cfg, ovf_counts):
        """Double capacities behind any overflowed counter.

        Returns (new_cfg or None, new_out_points or None); (None, None)
        means stuck."""
        import dataclasses

        new = {}
        new_out = None
        for name, count in zip(_OVF, ovf_counts):
            if not count:
                continue
            if name == "window_overflow" and cfg.assembly == "dense":
                grew_any = False
                if cfg.band_width:
                    nb = min(cfg.band_width * 2, (k_ext // 128) * 128)
                    if nb > cfg.band_width:
                        new["band_width"] = nb
                        grew_any = True
                if cfg.slice_width < k_ext:
                    new["slice_width"] = min(cfg.slice_width * 2, k_ext)
                    grew_any = True
                if not grew_any:
                    return None, None
            elif name == "occluder_overflow":
                new["max_occluders"] = cfg.max_occluders * 2
                new["max_bumps"] = max(cfg.max_bumps, cfg.max_occluders * 2)
            elif name == "bump_overflow":
                if cfg.max_bumps >= cfg.max_occluders:
                    return None, None
                new["max_bumps"] = min(cfg.max_bumps * 2, cfg.max_occluders)
            elif name == "channel_overflow":
                new["channel_capacity"] = cfg.channel_capacity * 2
            elif name == "compact_overflow":
                from lidar_snow_sim_tpu.models.snowfall import (
                    default_compact_capacity,
                )

                cap = cfg.compact_capacity or default_compact_capacity(
                    cfg, calib.num_lasers
                )
                new["compact_capacity"] = cap * 2
                if cfg.touch_capacity:
                    new["touch_capacity"] = min(
                        cfg.touch_capacity * 2, cap * 2
                    )
                if cfg.scatter_capacity:
                    new["scatter_capacity"] = min(
                        cfg.scatter_capacity * 2, cap * 2
                    )
            elif name == "out_overflow":
                if out_points >= cfg.max_points:
                    return None, None
                new_out = cfg.max_points  # one growth, then never again
            else:
                return None, None
        if not new and new_out is None:
            return None, None
        return (dataclasses.replace(cfg, **new) if new else cfg), new_out

    todo = []
    for sid in sample_ids:
        out_path = out_dir / f"{sid}.bin"
        if out_path.exists() and not overwrite:
            stats.frames_skipped += 1
            continue
        todo.append((sid, out_path))

    def _load_batch(chunk):
        """Load + FOV-filter one batch (runs on the IO thread so the next
        batch's disk reads overlap the device step). Padding happens in the
        main loop because an oversized scan can grow max_points."""
        raw, n_failed = [], 0
        for sid, out_path in chunk:
            try:
                pc = load_fn(sid)
            except Exception as e:  # noqa: BLE001 - per-frame fault tolerance
                logger.warning("failed to load %s: %s", sid, e)
                n_failed += 1
                continue
            if fov_filter is not None:
                pc = pc[fov_filter(pc[:, :3])]
            raw.append((sid, out_path, pc))
        return raw, n_failed

    def make_args(raw, cfg):
        """Pad + pack one batch into the 3-array device surface:
        (points (B, N, 4) f32 [x,y,z,intensity], chan (B, N) u8,
        in_meta (B, 3 + C) i32)."""
        n_cap = cfg.max_points
        pts = np.zeros((batch, n_cap, 4), np.float32)
        chan = np.zeros((batch, n_cap), np.uint8)
        ids = []
        for j, (sid, out_path, pc) in enumerate(raw):
            pts[j, : len(pc)] = pc[:, :4]
            chan[j, : len(pc)] = pc[:, 4].astype(np.uint8)
            ids.append((sid, out_path, len(pc)))
        # pad short batches with copies of frame 0 (masked out via
        # n_points=0) so tail frames carry well-conditioned data; one
        # compiled step serves every batch
        for j in range(len(raw), batch):
            pts[j] = pts[0]
            chan[j] = chan[0]
        n_list = [n for _, _, n in ids]

        # Per-frame randomness is a pure function of (seed, sample id), NOT
        # a position in a sequential stream — so outputs are byte-identical
        # across resume-after-interruption, --shard layouts, and batch
        # boundaries (the reference's unseeded shuffle has no such contract;
        # SURVEY §4 pins it as injectable).
        meta = np.zeros((batch, 3 + calib.num_lasers), np.int32)
        for j in range(batch):
            sid = ids[j][0] if j < len(ids) else f"_pad{j}"
            r = np.random.default_rng([seed, zlib.crc32(sid.encode())])
            order = (
                r.permutation(calib.num_lasers)
                if shuffle_channels
                else np.arange(calib.num_lasers)
            )
            meta[j, 0] = n_list[j] if j < len(n_list) else 0
            # key row = PRNGKey(s) raw data [hi, lo] = [0, s] for s < 2^31
            meta[j, 2] = int(r.integers(2**31))
            meta[j, 3:] = order
        return (pts, chan, meta), ids

    def unpack_rows(planes):
        """Transpose the device's (4|5, n) plane-major columns to (n, 5)
        rows and invert the (intensity << 2 | label) i32 bitcast pack
        (snowfall-only runs; wet intensities are floats and travel as-is)."""
        if wet_cfg is not None:
            return np.ascontiguousarray(planes.T)
        pk = np.ascontiguousarray(planes[3]).view(np.int32)
        out = np.empty((planes.shape[1], 5), np.float32)
        out[:, :3] = planes[:3].T
        out[:, 3] = (pk >> 2).astype(np.float32)
        out[:, 4] = (pk & 3).astype(np.float32)
        return out

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    io_pool = ThreadPoolExecutor(max_workers=1)
    fetch_pool = ThreadPoolExecutor(max_workers=1)
    batches = [todo[i : i + batch] for i in range(0, len(todo), batch)]
    next_fut = io_pool.submit(_load_batch, batches[0]) if batches else None

    fresh_step = True  # the next step(...) call will trace+compile
    cfg_gen = 0        # bumped on every capacity growth
    inflight: deque = deque()  # (ids, args, get future, n_compiles, gen)
    t_mark = time.time()

    def rerun(args):
        """Re-dispatch a batch under the CURRENT config (handles a batch
        whose max_points predates a later growth)."""
        if args[0].shape[1] == snow_cfg.max_points:
            out = step(*args)
        else:
            out = build_step(
                dataclasses.replace(snow_cfg, max_points=args[0].shape[1]),
                min(out_points, args[0].shape[1]),
            )(*args)
        return fetch_pool.submit(jax.device_get, out)

    def drain_one():
        """Fetch the oldest in-flight batch, retry-on-overflow, write."""
        nonlocal snow_cfg, step, out_points, cfg_gen, t_mark
        ids, args, fut, n_compiles, gen = inflight.popleft()
        for _attempt in range(8):
            points_c, out_meta = fut.result()
            ovf = out_meta[:, 4:10].sum(axis=0)
            if not ovf.any():
                break
            if gen != cfg_gen:
                # dispatched with a STALE config that a previous batch's
                # overflow already grew past: retry under the current one
                # before growing again (otherwise every stale in-flight
                # batch doubles the already-grown capacity once more)
                gen = cfg_gen
                fut = rerun(args)
                continue
            # capacities grow and the batch reruns: outputs are never
            # silently truncated (same contract as SnowfallAugmenter)
            grown, grown_out = grow_cfg(snow_cfg, [int(c) for c in ovf])
            if grown is None:
                raise RuntimeError(
                    "datagen capacity overflow not auto-resolvable: "
                    + str(dict(zip(_OVF, (int(c) for c in ovf))))
                )
            if grown_out is not None:
                out_points = grown_out
            logger.warning(
                "datagen capacities grew: %s out_points=%d",
                {k: getattr(grown, k) for k in (
                    "slice_width", "max_occluders", "max_bumps",
                    "channel_capacity", "compact_capacity")},
                out_points,
            )
            snow_cfg = grown
            step = build_step(snow_cfg, out_points)
            stats.capacity_growths += 1
            n_compiles += 1
            cfg_gen += 1
            gen = cfg_gen
            fut = rerun(args)
        else:
            raise RuntimeError("datagen capacity overflows persisted")
        for j, (sid, out_path, n_in) in enumerate(ids):
            aug = unpack_rows(points_c[j, :, : out_meta[j, 0]])
            aug.astype(np.float32).tofile(out_path)
            stats.frames_done += 1
            stats.points_in += n_in
            stats.points_out += len(aug)
            stats.attenuated += int(out_meta[j, 1])
            stats.removed += int(out_meta[j, 2])
        now = time.time()
        stats.batches.append(
            {"frames": len(ids), "s": round(now - t_mark, 4),
             "compiles": n_compiles}
        )
        t_mark = now

    for bi in range(len(batches)):
        raw, n_failed = next_fut.result()
        stats.frames_failed += n_failed
        if bi + 1 < len(batches):  # prefetch next while the device computes
            next_fut = io_pool.submit(_load_batch, batches[bi + 1])
        if not raw:
            continue
        n_compiles = 1 if fresh_step else 0
        fresh_step = False
        # scan capacity auto-grows like every other capacity: the reference
        # never drops points (precompute.py:96-106), so neither do we
        need = max(len(pc) for _, _, pc in raw)
        if need > snow_cfg.max_points:
            chunk_sz = snow_cfg.point_chunk
            new_cap = -(-need // chunk_sz) * chunk_sz
            logger.warning(
                "datagen max_points grew %d -> %d (scan with %d points)",
                snow_cfg.max_points, new_cap, need,
            )
            snow_cfg = dataclasses.replace(snow_cfg, max_points=new_cap)
            out_points = default_out_points(snow_cfg)
            step = build_step(snow_cfg, out_points)
            stats.capacity_growths += 1
            n_compiles += 1
        args, ids = make_args(raw, snow_cfg)
        # depth-2 dispatch pipeline with the result download on its own
        # thread: the next batch's upload, the previous batch's download,
        # and the device compute all overlap (the tunnel multiplexes
        # concurrent transfers — measured wall ~= max, not sum; BASELINE.md)
        inflight.append(
            (ids, args, fetch_pool.submit(jax.device_get, step(*args)),
             n_compiles, cfg_gen)
        )
        # pipeline_depth batches stay in flight so a multi-second tunnel
        # stall on one batch's download is absorbed instead of serializing
        # the whole chain behind it
        if len(inflight) >= max(pipeline_depth, 1):
            drain_one()
    while inflight:
        drain_one()

    io_pool.shutdown(wait=False)
    fetch_pool.shutdown(wait=True)
    stats.wall_s = time.time() - t_start
    try:
        import json

        (out_dir / "_manifest.json").write_text(
            json.dumps(
                {
                    "stats": stats.as_dict(),
                    "frames": len(sample_ids),
                    "batch": batch,
                    "seed": seed,
                    "wet_ground": wet_cfg is not None,
                    "mesh": dict(mesh.shape) if mesh is not None else None,
                },
                indent=2,
            )
        )
    except OSError as e:
        logger.warning("could not write manifest: %s", e)
    return stats


def iter_reference_grid(
    modes: Iterable[str] = ("gunn", "sekhon"),
    snowfall_rates=(0.5, 1.0, 2.0, 2.5, 1.5),
    terminal_velocities=(2.0, 1.6, 2.0, 1.6, 0.6),
):
    """The reference datagen grid: (mode, rainfall_rate, occupancy) combos
    (precompute.py:20-21,53-60)."""
    from lidar_snow_sim_tpu.sampling.distributions import (
        compute_occupancy,
        snowfall_rate_to_rainfall_rate,
    )

    for mode in modes:
        for s, v in zip(snowfall_rates, terminal_velocities):
            yield mode, snowfall_rate_to_rainfall_rate(s, v), compute_occupancy(s, v)
