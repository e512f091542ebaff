"""Headless detector inference — the viewer's `run_inference` without Qt.

Replicates the reference's live-inference orchestration
(`pointcloud_viewer.py:2388-2498`): take the currently displayed
(optionally augmented) cloud plus temporal neighbor scans, stack them,
run the detector from an experiment directory (last ``*.yaml`` + ``*.pth``
in listing order, exactly like `init_config`/`init_model`), and produce
the (K, 9) prediction array ``[box7 | label | score]`` the viewer renders
(`:2428-2436`) — here written to disk and/or drawn onto a BEV PNG.

The detector is the TPU-native engine in `models/pointpillars.py`; weights
come from `tools/convert_checkpoint.py` (``params_tpu.npz``, converted
on first use when a ``.pth`` is present) or ``--random-params`` for
smoke-testing the pipeline without a trained checkpoint.

Example:
  python -m lidar_snow_sim_tpu.tools.infer scan.bin --experiment exp/ \
      --augment snow --bank-dir banks --predictions preds.txt --bev out.png
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from lidar_snow_sim_tpu.tools.inspect import add_pipeline_args, run_pipeline


def load_engine(args):
    """(cfg, params, anchors) from --experiment / --config / --params."""
    from lidar_snow_sim_tpu.models.pointpillars import (
        PointPillarsConfig,
        config_from_openpcdet_yaml,
        generate_anchors,
        init_params,
    )
    from lidar_snow_sim_tpu.tools.convert_checkpoint import (
        convert_checkpoint,
        find_experiment_files,
        load_params,
    )

    yaml_path = args.config
    params_path = args.params
    pth_path = None
    if args.experiment:
        y, p = find_experiment_files(args.experiment)
        yaml_path = yaml_path or y
        pth_path = p
        npz = Path(args.experiment) / "params_tpu.npz"
        if params_path is None and npz.exists():
            params_path = npz

    cfg = (
        config_from_openpcdet_yaml(yaml_path)
        if yaml_path else PointPillarsConfig()
    )
    if args.max_pillars:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_pillars=args.max_pillars)

    if params_path is not None:
        params = load_params(params_path)
    elif pth_path is not None:
        out = Path(args.experiment) / "params_tpu.npz"
        params = convert_checkpoint(pth_path, cfg, out)
        print(f"converted {pth_path} -> {out}", file=sys.stderr)
    elif args.random_params:
        import jax

        params = init_params(cfg, jax.random.PRNGKey(args.seed))
        print("WARNING: using RANDOM weights (--random-params); "
              "predictions are smoke-test output only", file=sys.stderr)
    else:
        raise SystemExit(
            "no weights: pass --experiment with a .pth/params_tpu.npz, "
            "--params, or --random-params for a smoke test"
        )
    return cfg, params, generate_anchors(cfg)


def predictions_to_label_lines(arr, class_names) -> list:
    """(K, 9) predictions -> KITTI-style label lines (same convention
    `utils/boxes.py` parses back: z at box bottom, score last)."""
    lines = []
    for row in arr:
        x, y, z, dx, dy, dz, yaw, label, score = row
        name = (
            class_names[int(label) - 1]
            if 0 < int(label) <= len(class_names) else "Unknown"
        )
        lines.append(
            f"{name} 0 0 0 0 0 0 0 "
            f"{dz:.4f} {dy:.4f} {dx:.4f} {x:.4f} {y:.4f} {z - dz / 2:.4f} "
            f"{yaw:.4f} {score:.4f}"
        )
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_pipeline_args(ap)
    ap.add_argument("--experiment", default=None,
                    help="OpenPCDet experiment dir (.yaml + .pth / npz)")
    ap.add_argument("--config", default=None, help="explicit config yaml")
    ap.add_argument("--params", default=None, help="explicit params .npz")
    ap.add_argument("--random-params", action="store_true",
                    help="random weights (pipeline smoke test)")
    ap.add_argument("--temporal", nargs="*", default=[],
                    help="neighbor-frame .bin scans stacked into the input "
                         "(the viewer's temporal_pcs)")
    ap.add_argument("--exclude-current", action="store_true",
                    help="viewer's 'zero' checkbox OFF: only temporal scans")
    ap.add_argument("--intensity-scale", type=float, default=1.0 / 255.0,
                    help="intensity prescale before the detector (DENSE "
                         ".bin stores 0-255; pcdet models train on 0-1)")
    ap.add_argument("--max-pillars", type=int, default=0,
                    help="override pillar capacity (smaller = faster jit "
                         "on CPU)")
    ap.add_argument("--predictions", default=None,
                    help="write predictions here (.npy = (K, 9) array, "
                         "anything else = KITTI label lines)")
    ap.add_argument("--bev", default=None, help="BEV PNG with pred boxes")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lidar_snow_sim_tpu.models.pointpillars import (
        detect,
        predictions_array,
    )
    from lidar_snow_sim_tpu.utils.pointcloud import load_velodyne_bin

    # the viewer runs inference on the DISPLAYED cloud — augmentations and
    # masks included (run_inference uses self.current_pc, :2405-2414)
    pc, report, _ = run_pipeline(args, ap)

    list_of_pcs = [] if args.exclude_current else [pc]
    list_of_pcs += [load_velodyne_bin(t) for t in args.temporal]
    if not list_of_pcs:
        print("There are no points to process.", file=sys.stderr)  # :2412
        return 1
    points = np.vstack([p[:, :4] for p in list_of_pcs]).astype(np.float32)
    points[:, 3] *= args.intensity_scale

    cfg, params, anchors = load_engine(args)
    n = len(points)
    preds = jax.jit(
        lambda p, v: detect(p, v, params, jnp.asarray(anchors), cfg)
    )(jnp.asarray(points), jnp.ones(n, bool))
    arr = predictions_array(preds)

    report["inference"] = {
        "input_points": n,
        "num_predictions": int(preds.count),
        "points_dropped": int(preds.points_dropped),
        "pillars_dropped": int(preds.pillars_dropped),
        "nms_pre_overflow": int(preds.nms_pre_overflow),
        "classes": {
            cfg.class_names[int(c) - 1]: int((arr[:, 7] == c).sum())
            for c in np.unique(arr[:, 7]).astype(int)
            if 0 < c <= len(cfg.class_names)
        },
    }

    if args.predictions:
        if args.predictions.endswith(".npy"):
            np.save(args.predictions, arr)
        else:
            Path(args.predictions).write_text(
                "\n".join(predictions_to_label_lines(arr, cfg.class_names))
                + "\n"
            )
        report["inference"]["saved"] = str(Path(args.predictions).resolve())

    if args.bev:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from lidar_snow_sim_tpu.utils.boxes import Box3D, draw_boxes_bev
        from lidar_snow_sim_tpu.utils.render import bev_image

        img = bev_image(pc, color="label")
        boxes = [
            Box3D(
                x=float(r[0]), y=float(r[1]), z=float(r[2]),
                length=float(r[3]), width=float(r[4]), height=float(r[5]),
                yaw=float(r[6]),
                identity=(
                    cfg.class_names[int(r[7]) - 1]
                    if 0 < int(r[7]) <= len(cfg.class_names) else "Unknown"
                ),
                score=float(r[8]),
            )
            for r in arr
        ]
        draw_boxes_bev(img, boxes)
        plt.imsave(args.bev, img)
        report["inference"]["bev"] = str(Path(args.bev).resolve())

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
