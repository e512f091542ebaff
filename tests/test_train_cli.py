"""tools/train.py: synthetic + file-backed runs, checkpointing, exact
resume, and the inference handoff (params_tpu.npz loads into detect)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lidar_snow_sim_tpu.tools import train as train_cli

# pcdet-style yaml mirroring tests/test_pointpillars.TINY — also exercises
# config_from_openpcdet_yaml on the training path
TINY_YAML = """
CLASS_NAMES: [Car, Pedestrian]
DATA_CONFIG:
    POINT_CLOUD_RANGE: [0.0, -8.0, -3.0, 16.0, 8.0, 1.0]
    DATA_PROCESSOR:
        - NAME: transform_points_to_voxels
          VOXEL_SIZE: [0.5, 0.5, 4.0]
          MAX_POINTS_PER_VOXEL: 8
          MAX_NUMBER_OF_VOXELS: {train: 128, test: 128}
MODEL:
    VFE:
        NUM_FILTERS: [16]
    BACKBONE_2D:
        LAYER_NUMS: [1, 1, 1]
        LAYER_STRIDES: [2, 2, 2]
        NUM_FILTERS: [16, 32, 64]
        UPSAMPLE_STRIDES: [1, 2, 4]
        NUM_UPSAMPLE_FILTERS: [16, 16, 16]
    DENSE_HEAD:
        ANCHOR_GENERATOR_CONFIG:
            - class_name: Car
              anchor_sizes: [[3.9, 1.6, 1.56]]
              anchor_rotations: [0, 1.57]
              anchor_bottom_heights: [-1.78]
              matched_threshold: 0.6
              unmatched_threshold: 0.45
            - class_name: Pedestrian
              anchor_sizes: [[0.8, 0.6, 1.73]]
              anchor_rotations: [0, 1.57]
              anchor_bottom_heights: [-0.6]
              matched_threshold: 0.5
              unmatched_threshold: 0.35
POST_PROCESSING:
    NMS_CONFIG:
        NMS_PRE_MAXSIZE: 64
        NMS_POST_MAXSIZE: 16
"""


@pytest.fixture()
def tiny_yaml(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(TINY_YAML)
    return str(p)


def _run(tmp_path, tiny_yaml, out_name, steps, extra=()):
    out = tmp_path / out_name
    argv = [
        "--synthetic", "4", "--steps", str(steps), "--batch", "2",
        "--max-points", "512", "--max-gt", "8", "--config", tiny_yaml,
        "--out", str(out), "--save-every", "2", "--dtype", "float32",
        "--log-every", "1", "--seed", "3",
        *extra,
    ]
    assert train_cli.main(argv) == 0
    return out


def test_synthetic_train_writes_checkpoints(tmp_path, tiny_yaml):
    out = _run(tmp_path, tiny_yaml, "run", steps=3)
    names = sorted(p.name for p in out.glob("*.npz"))
    assert names == ["ckpt_0000002.npz", "ckpt_0000003.npz",
                     "params_tpu.npz"]
    z = np.load(out / "ckpt_0000003.npz")
    assert int(z["step"]) == 3
    assert all(np.isfinite(z[k]).all() for k in z.files)


def test_resume_is_bit_exact(tmp_path, tiny_yaml):
    full = _run(tmp_path, tiny_yaml, "full", steps=4)
    # first leg stops after 2 of 4 steps (same LR schedule as the full run)
    _run(tmp_path, tiny_yaml, "part", steps=4, extra=("--limit-steps", "2"))
    part = _run(tmp_path, tiny_yaml, "part", steps=4, extra=("--resume",))
    a = np.load(full / "params_tpu.npz")
    b = np.load(part / "params_tpu.npz")
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_file_dataset_and_inference_handoff(tmp_path, tiny_yaml):
    from lidar_snow_sim_tpu.models import pointpillars as pp
    from lidar_snow_sim_tpu.tools.convert_checkpoint import load_params
    from lidar_snow_sim_tpu.utils.pointcloud import save_velodyne_bin

    scans = tmp_path / "scans"
    labels = tmp_path / "labels"
    scans.mkdir()
    labels.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        n = 300 + 40 * i
        pc = np.zeros((n, 5), np.float32)
        pc[:, 0] = rng.uniform(0, 16, n)
        pc[:, 1] = rng.uniform(-8, 8, n)
        pc[:, 2] = rng.uniform(-3, 1, n)
        pc[:, 3] = rng.uniform(0, 255, n)
        save_velodyne_bin(pc, scans / f"{i:06d}.bin")
        # one Car + one foreign-class row (must be dropped)
        (labels / f"{i:06d}.txt").write_text(
            "Car 0 0 0 0 0 50 50 1.56 1.6 3.9 8.0 0.0 -1.9 0.3\n"
            "Tram 0 0 0 0 0 50 50 2.0 2.0 8.0 4.0 2.0 -1.9 0.0\n"
        )

    out = tmp_path / "ckpt"
    argv = [
        "--scans", str(scans), "--labels", str(labels),
        "--steps", "2", "--batch", "2", "--max-points", "512",
        "--max-gt", "8", "--config", tiny_yaml, "--out", str(out),
        "--dtype", "float32", "--log-every", "1",
    ]
    assert train_cli.main(argv) == 0

    cfg = pp.config_from_openpcdet_yaml(tiny_yaml)
    params = load_params(out / "params_tpu.npz")
    anchors = pp.generate_anchors(cfg)
    pts = np.zeros((512, 4), np.float32)
    pts[:, 0] = np.linspace(1, 15, 512)
    pts[:, 2] = -1.5
    preds = pp.detect(
        pts, np.ones(512, bool), params,
        np.asarray(anchors).reshape(anchors.shape), cfg,
    )
    assert np.isfinite(np.asarray(preds.scores)).all()


def test_gt_class_mapping(tmp_path, tiny_yaml):
    """Foreign classes are dropped; kept classes map to 1-based ids."""
    from lidar_snow_sim_tpu.models import pointpillars as pp

    class A:  # argparse namespace stub
        synthetic = 0
        scans = None
        labels = None
        seed = 0
        max_points = 64
        max_gt = 4
        intensity_scale = 1.0
        columns = 5

    cfg = pp.config_from_openpcdet_yaml(tiny_yaml)
    # exercise via the label path of _collect_frames
    from lidar_snow_sim_tpu.utils.pointcloud import save_velodyne_bin

    scans = tmp_path / "s"
    labels = tmp_path / "l"
    scans.mkdir()
    labels.mkdir()
    pc = np.zeros((10, 5), np.float32)
    pc[:, 0] = 5.0
    save_velodyne_bin(pc, scans / "000000.bin")
    (labels / "000000.txt").write_text(
        "Pedestrian 0 0 0 0 0 50 50 1.73 0.6 0.8 5.0 0.0 -1.9 0.0\n"
        "Cyclist 0 0 0 0 0 50 50 1.7 0.6 1.8 6.0 0.0 -1.9 0.0\n"
    )
    a = A()
    a.scans = str(scans)
    a.labels = str(labels)
    frames = train_cli._collect_frames(a, cfg)
    assert len(frames) == 1
    gt = frames[0][1]
    assert (gt[:, 7] > 0).sum() == 1          # Cyclist dropped
    assert gt[0, 7] == 2                      # Pedestrian is class 2
    assert gt[0, 2] == pytest.approx(-1.9 + 1.73 / 2)  # recentred z


def test_train_with_augmentor_flags(tmp_path, tiny_yaml):
    """--augment + --gt-sampling: the full pcdet DataAugmentor pipeline
    runs end-to-end and stays deterministic under --seed (two runs of the
    same config produce identical checkpoints)."""
    from lidar_snow_sim_tpu.utils.pointcloud import save_velodyne_bin

    scans = tmp_path / "scans"
    labels = tmp_path / "labels"
    scans.mkdir()
    labels.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        pc = np.zeros((400, 5), np.float32)
        pc[:, 0] = rng.uniform(0, 16, 400)
        pc[:, 1] = rng.uniform(-8, 8, 400)
        pc[:, 2] = rng.uniform(-3, 1, 400)
        pc[:, 3] = rng.uniform(0, 255, 400)
        # a Car at a per-frame spot with interior points (so the gt
        # database has something to keep)
        cx = 4.0 + 3.0 * i
        pc[:60, 0] = rng.uniform(cx - 1.5, cx + 1.5, 60)
        pc[:60, 1] = rng.uniform(-0.7, 0.7, 60)
        pc[:60, 2] = rng.uniform(-1.9, -0.5, 60)
        save_velodyne_bin(pc, scans / f"{i:06d}.bin")
        (labels / f"{i:06d}.txt").write_text(
            f"Car 0 0 0 0 0 50 50 1.56 1.6 3.9 {cx} 0.0 -1.9 0.0\n"
        )

    def run(name):
        out = tmp_path / name
        argv = [
            "--scans", str(scans), "--labels", str(labels),
            "--steps", "2", "--batch", "2", "--max-points", "512",
            "--max-gt", "8", "--config", tiny_yaml, "--out", str(out),
            "--dtype", "float32", "--log-every", "1", "--seed", "11",
            "--augment", "--gt-sampling", "Car:4,Pedestrian:2",
            "--gt-db-min-points", "5",
        ]
        assert train_cli.main(argv) == 0
        return np.load(out / "params_tpu.npz")

    a, b = run("a"), run("b")
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_gt_sampling_requires_labels(tmp_path, tiny_yaml):
    with pytest.raises(SystemExit):
        train_cli.main([
            "--synthetic", "2", "--steps", "1", "--batch", "1",
            "--max-points", "128", "--max-gt", "4", "--config", tiny_yaml,
            "--out", str(tmp_path / "x"), "--gt-sampling", "Car:4",
        ])


def test_oversized_scan_subsample_is_decorrelated_per_scan(tmp_path, tiny_yaml):
    """Two oversized scans with identical contents but different stems must
    not drop the same point indices (per-(seed, stem) RNG, matching the
    repo's per-frame (seed, id) convention)."""
    from lidar_snow_sim_tpu.models import pointpillars as pp
    from lidar_snow_sim_tpu.utils.pointcloud import save_velodyne_bin

    class A:
        synthetic = 0
        labels = None
        seed = 0
        max_points = 32
        max_gt = 4
        intensity_scale = 1.0
        columns = 5

    cfg = pp.config_from_openpcdet_yaml(tiny_yaml)
    scans = tmp_path / "s"
    scans.mkdir()
    pc = np.zeros((64, 5), np.float32)
    pc[:, 0] = np.arange(64)  # identify points by x
    for stem in ("000000", "000001"):
        save_velodyne_bin(pc, scans / f"{stem}.bin")
    a = A()
    a.scans = str(scans)
    frames = train_cli._collect_frames(a, cfg)
    assert len(frames) == 2
    xa = np.sort(frames[0][0][:, 0])
    xb = np.sort(frames[1][0][:, 0])
    assert not np.array_equal(xa, xb)
