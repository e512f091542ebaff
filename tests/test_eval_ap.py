"""KITTI-protocol AP evaluator (`utils/eval_ap.py`).

The protocol under test is OpenPCDet's vendored KITTI evaluator
(`kitti_object_eval_python/eval.py` — consumed surface of the paper's
experiment tables; submodule dir empty in the snapshot, semantics pinned
from the official evaluator). Cases are hand-computable scenes large
enough (>=41 counted GTs) that the 41-recall-point threshold sampling is
non-degenerate.
"""

import numpy as np
import pytest

from lidar_snow_sim_tpu.utils import eval_ap


def _boxes_grid(n, cls="Car", dx=4.0, dy=1.8, dz=1.6, spacing=15.0):
    """n well-separated identical boxes (no cross-talk in matching)."""
    boxes = np.zeros((n, 7))
    side = int(np.ceil(np.sqrt(n)))
    for i in range(n):
        boxes[i] = [
            (i % side) * spacing, (i // side) * spacing, 0.0,
            dx, dy, dz, 0.3,
        ]
    return boxes, [cls] * n


def _perfect_scene(n=50, n_frames=2, cls="Car"):
    """n GTs split over n_frames, each detected exactly (distinct scores)."""
    gts, dets = [], []
    per = n // n_frames
    score = iter(np.linspace(0.95, 0.10, n))
    for _ in range(n_frames):
        b, names = _boxes_grid(per, cls)
        gts.append(eval_ap.gt_frame(b, names))
        dets.append(
            eval_ap.det_frame(b, names, [next(score) for _ in range(per)])
        )
    return gts, dets


def test_perfect_detection_ap_is_one():
    gts, dets = _perfect_scene(50)
    for mode in ("R40", "R11"):
        ap = eval_ap.average_precision(
            gts, dets, "Car", metric="3d", recall_mode=mode
        )
        assert ap == pytest.approx(1.0, abs=1e-9), mode


def test_no_detections_ap_is_zero():
    gts, _ = _perfect_scene(50)
    empty = [eval_ap.det_frame(np.zeros((0, 7)), [], []) for _ in gts]
    assert eval_ap.average_precision(gts, empty, "Car") == 0.0


def test_no_gt_is_nan():
    _, dets = _perfect_scene(50)
    empty = [eval_ap.gt_frame(np.zeros((0, 7)), []) for _ in dets]
    assert np.isnan(eval_ap.average_precision(empty, dets, "Car"))


def test_half_recall_halves_r40():
    # detect only every other GT: recall caps at 0.5 with precision 1, so
    # R40 = (number of filled recall positions) / 40 = 20/40
    gts, dets = _perfect_scene(80, n_frames=2)
    half = [
        eval_ap.det_frame(
            d["boxes"][::2], d["names"][::2], d["scores"][::2]
        )
        for d in dets
    ]
    ap = eval_ap.average_precision(gts, half, "Car", metric="3d")
    assert ap == pytest.approx(0.5, abs=0.03)


def test_low_score_false_positives_are_free():
    # fps strictly below every tp score fall under every sampled
    # threshold (ignored_threshold) -> AP stays exactly 1.0
    gts, dets = _perfect_scene(50)
    fp_boxes, fp_names = _boxes_grid(4, "Car")
    fp_boxes = fp_boxes + np.array([500.0, 500.0, 0, 0, 0, 0, 0])
    noisy = list(dets)
    noisy[0] = eval_ap.det_frame(
        np.concatenate([dets[0]["boxes"], fp_boxes]),
        dets[0]["names"] + fp_names,
        np.concatenate([dets[0]["scores"], np.full(4, 0.01)]),
    )
    ap = eval_ap.average_precision(gts, noisy, "Car")
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_high_score_false_positives_cost_precision():
    gts, dets = _perfect_scene(50)
    fp_boxes, fp_names = _boxes_grid(10, "Car")
    fp_boxes = fp_boxes + np.array([500.0, 500.0, 0, 0, 0, 0, 0])
    noisy = list(dets)
    noisy[0] = eval_ap.det_frame(
        np.concatenate([dets[0]["boxes"], fp_boxes]),
        dets[0]["names"] + fp_names,
        np.concatenate([dets[0]["scores"], np.full(10, 0.99)]),
    )
    ap = eval_ap.average_precision(gts, noisy, "Car")
    # every threshold admits the 10 fps: precision <= 50/60
    assert ap < 50.0 / 60.0 + 1e-6
    assert ap > 0.5


def test_foreign_class_detections_do_not_interact():
    gts, dets = _perfect_scene(50, cls="Car")
    ped_boxes, ped_names = _boxes_grid(5, "Pedestrian", dx=0.6, dy=0.6)
    ped_boxes = ped_boxes + np.array([300.0, 0, 0, 0, 0, 0, 0])
    mixed = list(dets)
    mixed[0] = eval_ap.det_frame(
        np.concatenate([dets[0]["boxes"], ped_boxes]),
        dets[0]["names"] + ped_names,
        np.concatenate([dets[0]["scores"], np.full(5, 0.99)]),
    )
    ap = eval_ap.average_precision(gts, mixed, "Car")
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_similar_class_van_never_counts_as_fp_or_fn():
    # a Van GT detected as Car: the det matches an ignored GT (no fp),
    # the Van GT itself is never a fn -> AP unchanged at 1.0
    gts, dets = _perfect_scene(50)
    van_box = np.array([[777.0, 0.0, 0.0, 5.0, 2.0, 2.0, 0.1]])
    g0 = gts[0]
    gts = list(gts)
    gts[0] = eval_ap.gt_frame(
        np.concatenate([g0["boxes"], van_box]), g0["names"] + ["Van"]
    )
    dets = list(dets)
    dets[0] = eval_ap.det_frame(
        np.concatenate([dets[0]["boxes"], van_box]),
        dets[0]["names"] + ["Car"],
        np.concatenate([dets[0]["scores"], [0.99]]),
    )
    ap = eval_ap.average_precision(gts, dets, "Car")
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_difficulty_buckets_follow_official_thresholds():
    # an occlusion-2 GT is ignored on easy/moderate (its det matches an
    # ignored GT: no fp) and counted on hard
    n = 50
    boxes, names = _boxes_grid(n + 1)
    trunc = np.zeros(n + 1)
    occ = np.zeros(n + 1)
    occ[-1] = 2
    gt = eval_ap.gt_frame(boxes, names, truncated=trunc, occluded=occ)
    miss_last = eval_ap.det_frame(
        boxes[:-1], names[:-1], np.linspace(0.9, 0.1, n)
    )
    for diff in (0, 1):
        ap = eval_ap.average_precision(
            [gt], [miss_last], "Car", difficulty=diff
        )
        assert ap == pytest.approx(1.0, abs=1e-9), diff
    ap_hard = eval_ap.average_precision([gt], [miss_last], "Car", difficulty=2)
    assert ap_hard < 1.0


def test_bbox_height_gate_uses_min_height():
    n = 50
    boxes, names = _boxes_grid(n + 1)
    bh = np.full(n + 1, 100.0)
    bh[-1] = 30.0  # < 40px: ignored on easy, counted on moderate/hard
    gt = eval_ap.gt_frame(boxes, names, bbox_height=bh)
    miss_last = eval_ap.det_frame(
        boxes[:-1], names[:-1], np.linspace(0.9, 0.1, n)
    )
    assert eval_ap.average_precision(
        [gt], [miss_last], "Car", difficulty=0
    ) == pytest.approx(1.0, abs=1e-9)
    assert eval_ap.average_precision(
        [gt], [miss_last], "Car", difficulty=1
    ) < 1.0


def test_iou_threshold_gates_matching():
    # a det shifted to ~0.47 3D IoU matches at 0.3 but not at 0.7 (Car)
    n = 50
    boxes, names = _boxes_grid(n)
    shifted = boxes.copy()
    shifted[:, 0] += 1.0  # 4m-long boxes, 1m shift -> IoU 3/5 BEV ~ 0.43 3D
    gt = [eval_ap.gt_frame(boxes, names)]
    det = [eval_ap.det_frame(shifted, names, np.linspace(0.9, 0.1, n))]
    assert eval_ap.average_precision(
        gt, det, "Car", min_overlap=0.3
    ) == pytest.approx(1.0, abs=1e-9)
    assert eval_ap.average_precision(gt, det, "Car", min_overlap=0.7) == 0.0


def test_evaluate_table_shape_and_consistency():
    gts, dets = _perfect_scene(50)
    table = eval_ap.evaluate(
        gts, dets, classes=("Car", "Pedestrian"), metrics=("3d", "bev"),
    )
    assert table["Car"]["3d"]["moderate"] == pytest.approx(1.0, abs=1e-9)
    assert table["Car"]["bev"]["easy"] == pytest.approx(1.0, abs=1e-9)
    assert np.isnan(table["Pedestrian"]["3d"]["hard"])  # no ped GTs


def test_box3d_roundtrip_through_label_files(tmp_path):
    # tools/infer.py label lines -> read_label_file -> det_frame; the
    # same boxes as GT give AP 1.0 (z bottom/center convention agrees)
    from lidar_snow_sim_tpu.tools.infer import predictions_to_label_lines
    from lidar_snow_sim_tpu.utils.boxes import read_label_file

    n = 50
    boxes, names = _boxes_grid(n)
    scores = np.linspace(0.9, 0.1, n)
    arr = np.concatenate(
        [boxes, np.ones((n, 1)), scores[:, None]], axis=1
    )  # label 1 == Car
    lines = predictions_to_label_lines(arr, ("Car", "Pedestrian", "Cyclist"))
    p = tmp_path / "preds.txt"
    p.write_text("\n".join(lines))
    det = eval_ap.det_frame_from_boxes(read_label_file(p, classes=None))
    gt = eval_ap.gt_frame_from_boxes(read_label_file(p, classes=None))
    np.testing.assert_allclose(det["boxes"], boxes, atol=1e-3)
    ap = eval_ap.average_precision([gt], [det], "Car")
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_evaluate_cli_end_to_end(tmp_path, capsys):
    import json

    from lidar_snow_sim_tpu.tools.evaluate import main as eval_main
    from lidar_snow_sim_tpu.tools.infer import predictions_to_label_lines

    n = 50
    boxes, _ = _boxes_grid(n)
    scores = np.linspace(0.9, 0.1, n)
    arr = np.concatenate([boxes, np.ones((n, 1)), scores[:, None]], axis=1)
    lines = predictions_to_label_lines(arr, ("Car",))
    preds = tmp_path / "preds"
    labels = tmp_path / "labels"
    preds.mkdir()
    labels.mkdir()
    for stem in ("frame_a", "frame_b"):
        (preds / f"{stem}.txt").write_text("\n".join(lines))
        (labels / f"{stem}.txt").write_text("\n".join(lines))
    out = tmp_path / "table.json"
    eval_main([
        "--predictions", str(preds), "--labels", str(labels),
        "--classes", "Car", "--metrics", "3d", "--out", str(out),
    ])
    capsys.readouterr()
    report = json.loads(out.read_text())
    assert report["frames"] == 2
    assert report["gt_boxes"] == 2 * n
    assert report["ap"]["Car"]["3d"]["moderate"] == pytest.approx(1.0)


def test_gt_frame_from_annotations_maps_label_fields():
    anns = [{
        "identity": "Car", "truncated": 0.1, "occlusion": 1,
        "bbox": (10.0, 20.0, 60.0, 65.0),
        "height": 1.6, "width": 1.8, "length": 4.0,
        "posx_lidar": 5.0, "posy_lidar": 1.0, "posz_lidar": -1.6,
        "rotz": 0.2,
    }]
    gt = eval_ap.gt_frame_from_annotations(anns)
    np.testing.assert_allclose(
        gt["boxes"][0], [5.0, 1.0, -0.8, 4.0, 1.8, 1.6, 0.2]
    )
    assert gt["bbox_height"][0] == pytest.approx(45.0)
    assert gt["occluded"][0] == 1


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("compute_fp", [False, True])
def test_vectorized_matcher_equals_literal_loop(seed, compute_fp):
    """The numpy first-argmax matcher must reproduce the literal
    compute_statistics_jit loop on adversarial inputs: score/overlap
    ties, ignored gts/dets (codes -1/0/1), thresholded dets, and empty
    candidate sets."""
    rng = np.random.default_rng(seed)
    n_gt, n_dt = rng.integers(0, 12), rng.integers(0, 16)
    # quantized overlaps/scores force frequent exact ties
    overlaps = rng.integers(0, 5, (n_gt, n_dt)) / 5.0
    scores = rng.integers(0, 4, n_dt) / 4.0
    ignored_gt = rng.choice([-1, 0, 1], n_gt)
    ignored_det = rng.choice([-1, 0, 1], n_dt)
    thresh = 0.3 if compute_fp else 0.0
    got = eval_ap._frame_statistics(
        overlaps, scores, ignored_gt, ignored_det, 0.4, thresh, compute_fp
    )
    want = eval_ap._frame_statistics_ref(
        overlaps, scores, ignored_gt, ignored_det, 0.4, thresh, compute_fp
    )
    assert got[:3] == want[:3]
    assert list(got[3]) == list(want[3])


def test_evaluate_cli_rejects_missing_gt_file(tmp_path):
    from lidar_snow_sim_tpu.tools.evaluate import main as eval_main

    preds = tmp_path / "preds"
    labels = tmp_path / "labels"
    preds.mkdir()
    labels.mkdir()
    (preds / "frame_a.txt").write_text(
        "Car 0 0 0 0 0 50 50 1.6 1.8 4.0 5.0 0.0 -1.6 0.0 0.9\n"
    )
    with pytest.raises(SystemExit, match="no same-named"):
        eval_main(["--predictions", str(preds), "--labels", str(labels)])


def test_evaluate_cli_dense_requires_dataset_root(tmp_path):
    """Without the calib JSONs every dense GT box would sit at the origin
    and the table would silently read ~0 AP."""
    from lidar_snow_sim_tpu.tools.evaluate import main as eval_main

    preds = tmp_path / "p.txt"
    labels = tmp_path / "l.txt"
    preds.write_text("")
    labels.write_text("")
    with pytest.raises(SystemExit, match="dataset-root"):
        eval_main([
            "--predictions", str(preds), "--labels", str(labels),
            "--format", "dense",
        ])


def test_pair_overlap_jit_is_cached():
    """The jitted IoU kernel must be built once per metric, not per frame
    (jit-inside-the-loop re-traces and discards its cache every call)."""
    from lidar_snow_sim_tpu.utils.eval_ap import _jitted_iou

    assert _jitted_iou("3d") is _jitted_iou("3d")
    assert _jitted_iou("bev") is _jitted_iou("bev")
    assert _jitted_iou("3d") is not _jitted_iou("bev")
