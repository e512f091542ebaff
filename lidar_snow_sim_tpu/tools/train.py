"""Train / fine-tune the PointPillars detector on a directory of scans.

Completes the reference's experiment workflow: the CVPR'22 paper
precomputes snow-augmented datasets (`tools/snowfall/precompute.py` →
here `tools/precompute.py` / `parallel/datagen.py`) and then trains
OpenPCDet detectors on them (`lib/OpenPCDet` `train.py`, an empty
submodule dir in the snapshot; the viewer consumes the resulting
checkpoints, `pointcloud_viewer.py:2478-2494`). This CLI is the
TPU-native stand-in for that training step, built on
`models/detector_train.py` (pcdet target-assignment/loss contract) and
the engine in `models/pointpillars.py`.

Data layout: a directory of KITTI-style `.bin` clouds (x y z intensity
f32 — exactly what `parallel.datagen` emits) plus a labels directory of
same-stem `.txt` files in the KITTI-LiDAR layout `tools/infer.py`
writes and `tools/evaluate.py` consumes. Boxes whose class is not in
the config's CLASS_NAMES are dropped (pcdet's dataset filtering).

Augmentation (pcdet DataAugmentor pipeline, `models/detector_augment.py`):
`--gt-sampling 'Car:15,...'` builds a gt database from the labels dir and
pastes collision-free samples per frame (host-side, like pcdet's
dataloader); `--augment` applies world flip/rotation/scaling on-device
per step. Both streams are (seed, step)-deterministic, so `--resume`
replays them bit-exactly.

Optimizer: Adam driven by a one-cycle schedule
(`optax.cosine_onecycle_schedule` with pcdet's pointpillar defaults:
LR 0.003, DIV_FACTOR 10, PCT_START 0.4). Documented delta vs pcdet's
`adam_onecycle`: pcdet also cycles Adam's beta1 (MOMS 0.95→0.85) and
uses its own linear-cosine annealer; the optax cosine one-cycle keeps
the same LR envelope without the momentum cycling.

Checkpoints are plain `.npz` (params + adam mu/nu/count + step), saved
every `--save-every` steps and at the end; `--resume` restarts from the
latest one bit-exactly (same RNG stream position by step count). The
final params load straight into `tools/infer.py --params`.

Data parallelism: with more than one visible device (or
`--dp-devices`), batches are sharded over a `("data",)` mesh and the
jitted step runs GSPMD data-parallel — the same path
`__graft_entry__.dryrun_multichip` validates against the unsharded
update.

Example (synthetic smoke run):
  python -m lidar_snow_sim_tpu.tools.train --synthetic 8 --steps 4 \
      --batch 2 --max-points 4096 --out ckpt_dir/
Real run on datagen output:
  python -m lidar_snow_sim_tpu.tools.train --scans out_snow/ \
      --labels labels/ --epochs 80 --batch 4 --out ckpt_dir/
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def _stem_key(stem: str) -> int:
    """Deterministic per-scan RNG word from the file stem (crc32 is stable
    across processes, unlike hash())."""
    import zlib

    return zlib.crc32(stem.encode())


def _collect_frames(args, cfg):
    """[(points (N,4) f32, gt (G,8) f32)] with fixed shapes."""
    name_to_id = {n: i + 1 for i, n in enumerate(cfg.class_names)}
    frames = []
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        r = cfg.point_cloud_range
        for _ in range(args.synthetic):
            n = args.max_points
            pts = rng.uniform(
                [r[0], r[1], r[2], 0.0], [r[3], r[4], r[5], 1.0], (n, 4)
            ).astype(np.float32)
            g = min(8, args.max_gt)
            gt = np.zeros((args.max_gt, 8), np.float32)
            gt[:g, 0] = rng.uniform(r[0] + 5, r[3] - 5, g)
            gt[:g, 1] = rng.uniform(r[1] + 5, r[4] - 5, g)
            gt[:g, 2] = rng.uniform(-1.8, 0.0, g)
            gt[:g, 3:6] = [4.0, 1.8, 1.6]
            gt[:g, 6] = rng.uniform(-np.pi, np.pi, g)
            gt[:g, 7] = rng.integers(1, len(cfg.class_names) + 1, g)
            frames.append((pts, gt))
        return frames

    from lidar_snow_sim_tpu.utils.boxes import read_label_file
    from lidar_snow_sim_tpu.utils.pointcloud import load_velodyne_bin

    scan_dir = Path(args.scans)
    label_dir = Path(args.labels) if args.labels else None
    bins = sorted(scan_dir.glob("*.bin"))
    if not bins:
        raise SystemExit(f"no .bin scans in {scan_dir}")
    dropped_points = dropped_gt = 0
    for b in bins:
        pc = load_velodyne_bin(b, columns=args.columns)[:, :4]
        pc = pc.astype(np.float32)
        pc[:, 3] *= args.intensity_scale
        if len(pc) > args.max_points:
            # random subsample, not head-truncation (the head of an STF
            # scan is the bottom lasers — a biased crop; see
            # parallel/datagen.py's auto-grow rationale)
            # per-scan (seed, stem) stream: one rng seeded with args.seed
            # alone would reuse the identical index stream for every scan,
            # correlating the subsampling across the corpus
            sel = np.random.default_rng([args.seed, _stem_key(b.stem)]).choice(
                len(pc), args.max_points, replace=False
            )
            pc = pc[sel]
            dropped_points += 1
        elif len(pc) < args.max_points:
            pad = np.zeros((args.max_points - len(pc), 4), np.float32)
            pad[:, :3] = 1e3  # outside point_cloud_range -> dead pillars
            pc = np.concatenate([pc, pad], axis=0)
        gt = np.zeros((args.max_gt, 8), np.float32)
        if label_dir is not None:
            lf = label_dir / (b.stem + ".txt")
            rows = [
                bx
                for bx in read_label_file(lf, classes=None)
                if bx.identity in name_to_id
            ] if lf.exists() else []
            if len(rows) > args.max_gt:
                rows = rows[: args.max_gt]
                dropped_gt += 1
            for i, bx in enumerate(rows):
                gt[i] = [
                    bx.x, bx.y, bx.z, bx.length, bx.width, bx.height,
                    bx.yaw, name_to_id[bx.identity],
                ]
        frames.append((pc, gt))
    if dropped_points or dropped_gt:
        print(
            f"WARNING: subsampled {dropped_points} oversized scans "
            f"(max_points={args.max_points}) and truncated gt in "
            f"{dropped_gt} frames (max_gt={args.max_gt})",
            file=sys.stderr,
        )
    return frames


def save_checkpoint(path, state):
    """TrainState -> flat npz (params + adam mu/nu + count + step)."""
    adam = state.opt_state[0]          # ScaleByAdamState
    arrs = {"step": np.asarray(state.step), "count": np.asarray(adam.count)}
    for k, v in state.params.items():
        arrs[f"params/{k}"] = np.asarray(v)
    for k, v in adam.mu.items():
        arrs[f"mu/{k}"] = np.asarray(v)
    for k, v in adam.nu.items():
        arrs[f"nu/{k}"] = np.asarray(v)
    np.savez(path, **arrs)


def load_checkpoint(path, init_state):
    """npz -> TrainState with the optimizer state rebuilt in place."""
    import jax.numpy as jnp

    z = np.load(path)
    params = {
        k[len("params/"):]: jnp.asarray(v)
        for k, v in z.items() if k.startswith("params/")
    }
    state = init_state(params)
    adam = state.opt_state[0]
    mu = {k[len("mu/"):]: jnp.asarray(v)
          for k, v in z.items() if k.startswith("mu/")}
    nu = {k[len("nu/"):]: jnp.asarray(v)
          for k, v in z.items() if k.startswith("nu/")}
    adam = adam._replace(
        count=jnp.asarray(z["count"]), mu=mu, nu=nu
    )
    # the schedule wrapper's own count (optax.adam(schedule) chains
    # scale_by_adam with scale_by_schedule) must resume too, or the LR
    # envelope would restart from step 0
    rest = []
    for s in state.opt_state[1:]:
        if hasattr(s, "count"):
            s = s._replace(count=jnp.asarray(z["count"]))
        rest.append(s)
    opt_state = (adam,) + tuple(rest)
    return state._replace(
        opt_state=opt_state, step=jnp.asarray(z["step"])
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scans", help="directory of .bin clouds")
    ap.add_argument("--labels", help="directory of KITTI-LiDAR label .txt")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic frames (smoke test)")
    ap.add_argument("--experiment", help="OpenPCDet experiment dir (yaml)")
    ap.add_argument("--config", help="explicit pcdet yaml")
    ap.add_argument("--init-params",
                    help="warm-start params .npz (e.g. a converted "
                         "checkpoint, for fine-tuning on augmented data)")
    ap.add_argument("--out", required=True, help="checkpoint directory")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --out")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=0,
                    help="explicit total steps (overrides --epochs)")
    ap.add_argument("--limit-steps", type=int, default=0,
                    help="stop after this many steps THIS invocation; the "
                         "LR schedule still spans the full run, so "
                         "--resume continues bit-exactly")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.003,
                    help="one-cycle peak LR (pcdet pointpillar default)")
    ap.add_argument("--max-points", type=int, default=65536)
    ap.add_argument("--max-gt", type=int, default=64)
    ap.add_argument("--intensity-scale", type=float, default=1.0 / 255.0,
                    help="DENSE .bin intensity is 0-255; pcdet trains 0-1")
    ap.add_argument("--columns", type=int, default=5,
                    help=".bin column count (STF/datagen scans are 5-wide)")
    ap.add_argument("--augment", action="store_true",
                    help="pcdet world augmentations (flip along x, "
                         "rotation U[-pi/4,pi/4], scaling U[0.95,1.05]) "
                         "applied on-device per step")
    ap.add_argument("--gt-sampling", default="",
                    help="pcdet gt-sampling SAMPLE_GROUPS, e.g. "
                         "'PassengerCar:15,Pedestrian:10': paste database "
                         "samples until each class reaches the target "
                         "count (requires --scans/--labels)")
    ap.add_argument("--gt-db-min-points", type=int, default=5,
                    help="gt database: min interior points per box "
                         "(pcdet filter_by_min_points)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--dp-devices", type=int, default=0,
                    help="shard batches over this many devices "
                         "(default: all visible when >1)")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if not args.synthetic and not args.scans:
        raise SystemExit("need --scans (or --synthetic N)")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from lidar_snow_sim_tpu.models import detector_train as dtr
    from lidar_snow_sim_tpu.models.pointpillars import (
        PointPillarsConfig,
        config_from_openpcdet_yaml,
        generate_anchors,
        init_params,
    )

    yaml_path = args.config
    if args.experiment and not yaml_path:
        from lidar_snow_sim_tpu.tools.convert_checkpoint import (
            find_experiment_files,
        )

        yaml_path, _ = find_experiment_files(args.experiment)
    cfg = (
        config_from_openpcdet_yaml(yaml_path)
        if yaml_path else PointPillarsConfig()
    )
    cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)

    frames = _collect_frames(args, cfg)
    steps_per_epoch = max(len(frames) // args.batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epochs

    name_to_id = {n: i + 1 for i, n in enumerate(cfg.class_names)}
    gt_db = gt_groups = None
    if args.gt_sampling:
        if not (args.scans and args.labels):
            raise SystemExit("--gt-sampling requires --scans and --labels")
        from lidar_snow_sim_tpu.models.detector_augment import (
            GTSampleDB,
            parse_sample_groups,
        )

        gt_groups = parse_sample_groups(args.gt_sampling)
        unknown = set(gt_groups) - set(cfg.class_names)
        if unknown:
            raise SystemExit(f"--gt-sampling classes not in config: {unknown}")
        gt_db = GTSampleDB.build(
            args.scans, args.labels, cfg.class_names,
            columns=args.columns, intensity_scale=args.intensity_scale,
            min_points=args.gt_db_min_points,
        )
        print(f"gt-sampling database: {gt_db.stats()}", file=sys.stderr)

    world_aug = None
    if args.augment:
        from lidar_snow_sim_tpu.models.detector_augment import world_augment

        world_aug = jax.jit(world_augment)

    if total_steps >= 4:
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=args.lr,
            pct_start=0.4, div_factor=10.0, final_div_factor=1000.0,
        )
    else:
        # a one-cycle over <4 steps has a zero-width warmup phase (optax
        # divides by the floored interval -> NaN LR); smoke runs get a
        # constant LR instead
        schedule = optax.constant_schedule(args.lr)
    optimizer = optax.adam(schedule)
    anchors = generate_anchors(cfg)
    step_fn, init_state = dtr.make_train_step(cfg, anchors, optimizer)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpts = sorted(out_dir.glob("ckpt_*.npz"))
    if args.resume and ckpts:
        state = load_checkpoint(ckpts[-1], init_state)
        print(f"resumed {ckpts[-1]} at step {int(state.step)}",
              file=sys.stderr)
    elif args.init_params:
        from lidar_snow_sim_tpu.tools.convert_checkpoint import load_params

        state = init_state(load_params(args.init_params))
        print(f"warm-started from {args.init_params}", file=sys.stderr)
    else:
        state = init_state(init_params(cfg, jax.random.PRNGKey(args.seed)))

    n_dev = args.dp_devices or len(jax.devices())
    sharding = None
    if n_dev > 1 and args.batch % n_dev == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        print(f"data-parallel over {n_dev} devices", file=sys.stderr)

    step_j = jax.jit(step_fn)
    t0 = time.time()
    start = int(state.step)
    for it in range(start, total_steps):
        # per-step seeded sampling (the repo's per-frame (seed, id) RNG
        # convention): batch composition depends only on (seed, step), so
        # --resume replays the exact remaining stream
        idx = np.random.default_rng((args.seed, it)).choice(
            len(frames), args.batch, replace=len(frames) < args.batch
        )
        batch = [frames[i] for i in idx]
        if gt_db is not None:
            batch = [
                gt_db.sample_into(
                    np.random.default_rng((args.seed, it, bi)),
                    p, g, gt_groups, name_to_id,
                )[:2]
                for bi, (p, g) in enumerate(batch)
            ]
        pts = jnp.asarray(np.stack([p for p, _g in batch]))
        gts = jnp.asarray(np.stack([g for _p, g in batch]))
        if world_aug is not None:
            # per-step key: the augmentation stream depends only on
            # (seed, step), so --resume replays the exact remainder
            pts, gts = world_aug(
                jax.random.fold_in(jax.random.PRNGKey(args.seed), it),
                pts, gts,
            )
        valid = jnp.ones(pts.shape[:2], bool)
        if sharding is not None:
            pts = jax.device_put(pts, sharding)
            gts = jax.device_put(gts, sharding)
            valid = jax.device_put(valid, sharding)
        state, metrics = step_j(state, pts, valid, gts)
        if (it + 1) % args.log_every == 0 or it + 1 == total_steps:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (it + 1 - start) / max(time.time() - t0, 1e-9)
            print(
                f"step {it + 1}/{total_steps} loss={m['loss']:.4f} "
                f"(cls {m['loss_cls']:.4f} loc {m['loss_loc']:.4f} "
                f"dir {m['loss_dir']:.4f}) pos={m['num_pos']:.1f} "
                f"lr={float(schedule(it)):.2e} {rate:.2f} steps/s",
                file=sys.stderr,
            )
        if (it + 1) % args.save_every == 0 or it + 1 == total_steps:
            path = out_dir / f"ckpt_{it + 1:07d}.npz"
            save_checkpoint(path, state)
            print(f"saved {path}", file=sys.stderr)
        if args.limit_steps and it + 1 - start >= args.limit_steps:
            break

    # make the stop point resumable even off the save-every grid
    path = out_dir / f"ckpt_{int(state.step):07d}.npz"
    if int(state.step) > start and not path.exists():
        save_checkpoint(path, state)
        print(f"saved {path}", file=sys.stderr)

    # inference-ready params for tools/infer.py --params
    final = out_dir / "params_tpu.npz"
    np.savez(final, **{k: np.asarray(v) for k, v in state.params.items()})
    print(f"wrote {final}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
