"""Checkpoint conversion + headless inference CLI (run_inference parity)."""

import json
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from lidar_snow_sim_tpu.models import pointpillars as pp
from lidar_snow_sim_tpu.tools import convert_checkpoint as cc

TINY_YAML = """
CLASS_NAMES: ['Car', 'Pedestrian']
DATA_CONFIG:
    POINT_CLOUD_RANGE: [0, -8, -3, 16, 8, 1]
    DATA_PROCESSOR:
        - NAME: transform_points_to_voxels
          VOXEL_SIZE: [0.5, 0.5, 4]
          MAX_POINTS_PER_VOXEL: 8
          MAX_NUMBER_OF_VOXELS: {train: 128, test: 128}
MODEL:
    VFE: {NUM_FILTERS: [16]}
    BACKBONE_2D:
        LAYER_NUMS: [1, 1, 1]
        LAYER_STRIDES: [2, 2, 2]
        NUM_FILTERS: [16, 32, 64]
        UPSAMPLE_STRIDES: [1, 2, 4]
        NUM_UPSAMPLE_FILTERS: [16, 16, 16]
    DENSE_HEAD:
        ANCHOR_GENERATOR_CONFIG: [
            {class_name: Car, anchor_sizes: [[3.9, 1.6, 1.56]],
             anchor_rotations: [0, 1.5707963],
             anchor_bottom_heights: [-1.78], feature_map_stride: 2,
             matched_threshold: 0.6, unmatched_threshold: 0.45},
            {class_name: Pedestrian, anchor_sizes: [[0.8, 0.6, 1.73]],
             anchor_rotations: [0, 1.5707963],
             anchor_bottom_heights: [-0.6], feature_map_stride: 2,
             matched_threshold: 0.5, unmatched_threshold: 0.35},
        ]
    POST_PROCESSING:
        SCORE_THRESH: 0.05
        NMS_CONFIG: {NMS_THRESH: 0.01, NMS_PRE_MAXSIZE: 64,
                     NMS_POST_MAXSIZE: 16}
"""


def _make_experiment(tmp_path, seed=0):
    """Experiment dir with a real torch .pth in pcdet layout."""
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "pointpillar.yaml").write_text(TINY_YAML)
    cfg = pp.config_from_openpcdet_yaml(exp / "pointpillar.yaml")
    rng = np.random.default_rng(seed)
    state = {
        name: torch.from_numpy(
            rng.normal(0, 0.05, shape).astype(np.float32)
            + (1.0 if name.endswith("running_var") else 0.0)
        )
        for name, shape in pp.param_shapes(cfg).items()
    }
    # pcdet checkpoints carry extra buffers the converter must ignore
    state["global_step"] = torch.tensor(1234)
    state["backbone_2d.blocks.0.2.num_batches_tracked"] = torch.tensor(7)
    torch.save({"model_state": state, "epoch": 80}, exp / "checkpoint.pth")
    return exp, cfg, state


def test_convert_checkpoint_roundtrip(tmp_path):
    exp, cfg, state = _make_experiment(tmp_path)
    yaml_path, pth_path = cc.find_experiment_files(exp)
    assert yaml_path.name == "pointpillar.yaml"
    assert pth_path.name == "checkpoint.pth"

    out = exp / "params_tpu.npz"
    params = cc.convert_checkpoint(pth_path, cfg, out)
    assert set(params) == set(pp.param_shapes(cfg))
    for name, arr in params.items():
        np.testing.assert_array_equal(arr, state[name].numpy())
    # loader reads back identically
    loaded = cc.load_params(out)
    for name in params:
        np.testing.assert_array_equal(loaded[name], params[name])


def test_convert_rejects_mismatched_shapes(tmp_path):
    exp, cfg, state = _make_experiment(tmp_path)
    state["vfe.pfn_layers.0.linear.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="shape mismatch"):
        cc.state_dict_to_params(state, cfg)
    del state["vfe.pfn_layers.0.linear.weight"]
    with pytest.raises(ValueError, match="missing"):
        cc.state_dict_to_params(state, cfg)


def test_converted_checkpoint_drives_detect(tmp_path):
    exp, cfg, _ = _make_experiment(tmp_path)
    _, pth = cc.find_experiment_files(exp)
    params = cc.convert_checkpoint(pth, cfg, exp / "params_tpu.npz")
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    pts = np.column_stack(
        [rng.uniform(0, 16, 500), rng.uniform(-8, 8, 500),
         rng.uniform(-3, 1, 500), rng.uniform(0, 1, 500)]
    ).astype(np.float32)
    preds = pp.detect(
        jnp.asarray(pts), jnp.ones(500, bool),
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(pp.generate_anchors(cfg)), cfg,
    )
    assert preds.boxes.shape == (cfg.nms_post_max, 7)
    assert int(preds.count) >= 0


def test_infer_cli_end_to_end(tmp_path, capsys):
    from lidar_snow_sim_tpu.tools import infer

    exp, cfg, _ = _make_experiment(tmp_path)
    rng = np.random.default_rng(2)
    n = 400
    scan = np.column_stack(
        [rng.uniform(3, 16, n), rng.uniform(-8, 8, n),
         rng.uniform(-3, 1, n), rng.uniform(0, 255, n),
         rng.integers(0, 64, n)]
    ).astype(np.float32)
    scan_path = tmp_path / "scan.bin"
    scan.tofile(scan_path)
    pred_path = tmp_path / "preds.txt"

    rc = infer.main(
        [str(scan_path), "--experiment", str(exp),
         "--predictions", str(pred_path)]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["inference"]["input_points"] > 0
    assert "num_predictions" in report["inference"]
    # label lines parse back through the box reader
    if report["inference"]["num_predictions"]:
        from lidar_snow_sim_tpu.utils.boxes import read_label_file

        boxes = read_label_file(pred_path, classes=None)
        assert len(boxes) == report["inference"]["num_predictions"]
    # the converted npz is cached in the experiment dir for reuse
    assert (exp / "params_tpu.npz").exists()


def test_infer_cli_temporal_and_exclude_current(tmp_path, capsys):
    from lidar_snow_sim_tpu.tools import infer

    exp, cfg, _ = _make_experiment(tmp_path)
    rng = np.random.default_rng(3)

    def scan(path, n):
        s = np.column_stack(
            [rng.uniform(3, 16, n), rng.uniform(-8, 8, n),
             rng.uniform(-3, 1, n), rng.uniform(0, 255, n),
             rng.integers(0, 64, n)]
        ).astype(np.float32)
        s.tofile(path)
        return s

    scan(tmp_path / "cur.bin", 300)
    scan(tmp_path / "prev.bin", 200)

    rc = infer.main(
        [str(tmp_path / "cur.bin"), "--experiment", str(exp),
         "--temporal", str(tmp_path / "prev.bin"), "--exclude-current"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    # 'zero' checkbox off: only the temporal scan feeds the detector
    assert report["inference"]["input_points"] == 200
