"""End-to-end CLI tests: gen_banks -> precompute -> inspect (SURVEY.md §3.3-3.5).

Uses a tiny grid + synthetic scans; checks the reference's resume semantics
(skip-if-exists) at both stages and the output directory layout.
"""

import json
import os

import numpy as np
import pytest

from lidar_snow_sim_tpu.tools.gen_banks import main as gen_main
from lidar_snow_sim_tpu.tools.inspect import main as inspect_main
from lidar_snow_sim_tpu.tools.precompute import (
    main as precompute_main,
    reference_sample_order,
)


def test_reference_sample_order():
    ids = ["a,1", "b,2", "c,3", "d,4", "e,5"]
    # sorted stems: a_1 b_2 c_3 d_4 e_5; halves: [a_1 b_2 c_3], [d_4 e_5]
    # -> second half + reversed first half (precompute.py:62-68)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(ids))
        path = f.name
    order = reference_sample_order(path)
    os.unlink(path)
    assert order == ["d_4", "e_5", "c_3", "b_2", "a_1"]


@pytest.mark.slow
def test_cli_pipeline(tmp_path, calib):
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    banks = tmp_path / "banks"
    # tiny grid: 1 rate x 1 velocity x gunn x 64 lines
    gen_args = [
        "--out-dir", str(banks), "--rates", "0.5", "--velocities", "2.0",
        "--modes", "gunn", "--lines", "64", "--workers", "4",
    ]
    assert gen_main(gen_args) == 0
    files = sorted(banks.glob("*.npy"))
    assert len(files) == 64
    mtimes = {f: f.stat().st_mtime_ns for f in files}
    assert gen_main(gen_args) == 0  # resume: nothing rewritten
    assert {f: f.stat().st_mtime_ns for f in files} == mtimes

    lidar = tmp_path / "lidar_hdl64_strongest"
    lidar.mkdir()
    ids = []
    for i in range(2):
        sid = f"2019-01-0{i + 1}_00-00-00,0000{i}"
        ids.append(sid)
        pc = synthetic_scan(n_azimuth=60, seed=i, calib=calib)
        pc.astype(np.float32).tofile(lidar / ("_".join(sid.split(",")) + ".bin"))
    split = tmp_path / "split.txt"
    split.write_text("\n".join(ids))

    pre_args = [
        "--split", str(split), "--lidar-dir", str(lidar),
        "--bank-dir", str(banks), "--modes", "gunn",
        "--rates", "0.5", "--velocities", "2.0", "--batch", "2",
        "--max-points", "8192", "--window-size", "512", "--no-fov-filter",
    ]
    assert precompute_main(pre_args) == 0
    out_dirs = list((tmp_path / "snowfall_simulation" / "gunn").iterdir())
    assert len(out_dirs) == 1
    assert out_dirs[0].name.startswith("lidar_hdl64_strongest_rainrate_")
    outs = sorted(out_dirs[0].glob("*.bin"))
    assert len(outs) == 2
    aug = np.fromfile(outs[0], np.float32).reshape(-1, 5)
    assert set(np.unique(aug[:, 4])) <= {0.0, 1.0, 2.0}
    assert precompute_main(pre_args) == 0  # resume path

    # headless inspect on one raw scan, snow augmentation + BEV dump
    scan = lidar / ("_".join(ids[0].split(",")) + ".bin")
    bev = tmp_path / "bev.png"
    assert inspect_main(
        [str(scan), "--augment", "snow", "--bank-dir", str(banks),
         "--bev", str(bev)]
    ) == 0
    assert bev.exists() and bev.stat().st_size > 0


@pytest.mark.slow
def test_precompute_full_reference_grid(tmp_path, calib):
    """Full 2x5 reference datagen grid through the CLI (`precompute.py:
    20-21,70-106`): one output directory per (mode, rainrate) with the
    reference naming, resume across an interruption (deleted outputs are
    regenerated, survivors untouched), and per-directory manifest
    aggregation."""
    from lidar_snow_sim_tpu.sampling.distributions import (
        compute_occupancy,
        snowfall_rate_to_rainfall_rate,
    )
    from lidar_snow_sim_tpu.tools.precompute import (
        SNOWFALL_RATES,
        TERMINAL_VELOCITIES,
    )
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    # fabricate EQUAL-SIZED banks for every combo so all ten runs share one
    # compiled kernel shape (the grid's capacity behavior is covered by
    # tests/test_reference_grid.py; this test is about the DRIVER)
    banks = tmp_path / "banks"
    banks.mkdir()
    rng = np.random.default_rng(0)
    for mode in ("gunn", "sekhon"):
        for s, v in zip(SNOWFALL_RATES, TERMINAL_VELOCITIES):
            rr = snowfall_rate_to_rainfall_rate(s, v)
            occ = compute_occupancy(s, v)
            for line in range(1, 65):
                ang = rng.uniform(0, 2 * np.pi, 40)
                d = np.sqrt(rng.uniform(0.01, 1, 40)) * 60
                r = rng.uniform(0.005, 0.05, 40)
                np.save(
                    banks / f"{mode}_{rr}_{occ}_{line}.npy",
                    np.column_stack(
                        [d * np.cos(ang), d * np.sin(ang), r]
                    ),
                )

    lidar = tmp_path / "lidar_hdl64_strongest"
    lidar.mkdir()
    ids = []
    for i in range(2):
        sid = f"2019-01-0{i + 1}_00-00-00,0000{i}"
        ids.append(sid)
        pc = synthetic_scan(n_azimuth=60, seed=i, calib=calib)
        pc.astype(np.float32).tofile(
            lidar / ("_".join(sid.split(",")) + ".bin")
        )
    split = tmp_path / "split.txt"
    split.write_text("\n".join(ids))

    args = [
        "--split", str(split), "--lidar-dir", str(lidar),
        "--bank-dir", str(banks), "--batch", "2",
        "--max-points", "8192", "--window-size", "256", "--no-fov-filter",
    ]
    assert precompute_main(args) == 0

    # reference directory layout: snowfall_simulation/{mode}/
    # {lidar}_rainrate_{int(rr)} — 2 modes x 5 distinct int rainrates
    root = tmp_path / "snowfall_simulation"
    rates_int = sorted(
        {int(snowfall_rate_to_rainfall_rate(s, v))
         for s, v in zip(SNOWFALL_RATES, TERMINAL_VELOCITIES)}
    )
    all_bins = {}
    for mode in ("gunn", "sekhon"):
        dirs = sorted(p.name for p in (root / mode).iterdir())
        assert dirs == sorted(
            f"lidar_hdl64_strongest_rainrate_{r}" for r in rates_int
        ), dirs
        for p in (root / mode).iterdir():
            bins = sorted(p.glob("*.bin"))
            assert len(bins) == 2
            manifest = json.loads((p / "_manifest.json").read_text())
            assert manifest["stats"]["frames_done"] == 2
            assert manifest["stats"]["frames_failed"] == 0
            assert manifest["frames"] == 2
            all_bins.update({b: b.stat().st_mtime_ns for b in bins})

    # interruption: delete one output per mode, rerun; only those two are
    # regenerated (byte-identical), everything else untouched
    victims = [
        next(iter(sorted((root / mode).iterdir())[0].glob("*.bin")))
        for mode in ("gunn", "sekhon")
    ]
    old_bytes = {v: v.read_bytes() for v in victims}
    for v in victims:
        v.unlink()
    assert precompute_main(args) == 0
    for b, mtime in all_bins.items():
        if b in victims:
            assert b.read_bytes() == old_bytes[b], f"{b} changed on resume"
        else:
            assert b.stat().st_mtime_ns == mtime, f"{b} rewritten on resume"
    for p in (root / "gunn").iterdir():
        manifest = json.loads((p / "_manifest.json").read_text())
        st = manifest["stats"]
        assert st["frames_done"] + st["frames_skipped"] == 2


def test_viewer_html(tmp_path, calib):
    """The browser viewer writes a self-contained interactive HTML with the
    decoded point payload, every color mode, stat labels, GT box
    wireframes, and the Qt viewer's temporal-frame browsing
    (pointcloud_viewer.py:236-3403, without Qt)."""
    import base64
    import json as _json
    import re

    from lidar_snow_sim_tpu.tools.viewer import main as viewer_main
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    # three temporal sibling sweeps (date_frame naming)
    for k in (4, 5, 6):
        pc = synthetic_scan(n_azimuth=120, seed=k, calib=calib)
        pc.astype(np.float32).tofile(tmp_path / f"2019-01-01_0000{k}.bin")
    scan = tmp_path / "2019-01-01_00005.bin"
    labels = tmp_path / "labels.txt"
    labels.write_text(
        "PassengerCar 0 0 0 0 0 50 50 1.5 1.6 3.9 1.0 1.0 20.0 0.1\n"
    )
    out = tmp_path / "v.html"
    assert viewer_main(
        [str(scan), "--out", str(out), "--labels", str(labels),
         "--max-points", "5000", "--neighbors=-1:1"]
    ) == 0
    s = out.read_text()
    frames = _json.loads(
        re.search(r"const FRAMES = (\[.*?\]);\n", s, re.S).group(1)
    )
    # all three temporal neighbors embedded, center selected
    assert [f["name"] for f in frames] == [
        "2019-01-01_00004", "2019-01-01_00005", "2019-01-01_00006"
    ]
    for f in frames:
        x = np.frombuffer(base64.b64decode(f["xs"]), np.float32)
        assert 0 < len(x) == f["n"] <= 5000
        assert set(f["colors"]) == {
            "label", "intensity", "height", "channel", "depth"
        }
        assert len(f["boxes"]) == 1 and len(f["boxes"][0]["c"]) == 8
        assert f["boxes"][0]["s"] == -1.0  # GT: never score-thresholded
    assert 'value="1" selected' in s  # center frame initially shown
    for mode in ("label", "intensity", "height", "channel", "depth"):
        assert f'<option value="{mode}">' in s
    assert "drag orbit" in s and "arrow keys" in s
    # brace-balanced script (the template is .format()-escaped JS)
    js = s[s.index("<script>"):]
    assert js.count("{") == js.count("}")


def test_viewer_result_pkl_and_camera_panel(tmp_path, calib):
    """Saved-results visualization (the Qt viewer's load_results /
    visualize_predictions, pointcloud_viewer.py:1388-1478) + the
    synchronized camera panel (populate_image, :3053-3065): an OpenPCDet
    result.pkl's matching frame renders score-thresholdable prediction
    boxes alongside GT, and the DENSE cam_stereo_left_lut sibling image is
    embedded."""
    import base64
    import json as _json
    import pickle
    import re

    from lidar_snow_sim_tpu.tools.viewer import main as viewer_main
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    lidar = tmp_path / "lidar_hdl64"
    cam = tmp_path / "cam_stereo_left_lut"
    lidar.mkdir()
    cam.mkdir()
    pc = synthetic_scan(n_azimuth=120, seed=1, calib=calib)
    scan = lidar / "2019-01-01_00007.bin"
    pc.astype(np.float32).tofile(scan)
    # tiny valid PNG (1x1, via matplotlib-free raw write through PIL)
    from PIL import Image

    Image.new("RGB", (4, 3), (10, 200, 30)).save(cam / scan.stem.__add__(".png"))

    result = [
        {
            "frame_id": "2019-01-01_00007",
            "boxes_lidar": np.array(
                [[10.0, 1.0, -0.8, 3.9, 1.6, 1.5, 0.2],
                 [20.0, -2.0, -0.8, 0.8, 0.6, 1.7, 0.0]], np.float32
            ),
            "name": np.array(["Car", "Pedestrian"]),
            "score": np.array([0.9, 0.3], np.float32),
        },
        {"frame_id": "0000", "boxes_lidar": np.zeros((0, 7), np.float32),
         "name": np.array([]), "score": np.zeros(0, np.float32)},
    ]
    rp = tmp_path / "result.pkl"
    rp.write_bytes(pickle.dumps(result))

    out = tmp_path / "v.html"
    assert viewer_main(
        [str(scan), "--out", str(out), "--results", str(rp),
         "--pred-threshold", "25", "--max-points", "4000"]
    ) == 0
    s = out.read_text()
    frames = _json.loads(
        re.search(r"const FRAMES = (\[.*?\]);\n", s, re.S).group(1)
    )
    boxes = frames[0]["boxes"]
    scores = sorted(b["s"] for b in boxes)
    assert scores == [0.3, 0.9]  # two predictions, no GT labels passed
    assert len({b["col"] for b in boxes}) == 2  # per-class colors
    assert frames[0]["img"] and frames[0]["img"].startswith(
        "data:image/png;base64,"
    )
    assert 'value="25"' in s  # initial slider position
    assert "predThr" in s


def test_viewer_pcdet_dict(tmp_path):
    """show_pcdet_dict (pointcloud_viewer.py:2500-2556): a pickled pcdet
    data_dict renders its points and gt_boxes directly."""
    import json as _json
    import pickle
    import re

    from lidar_snow_sim_tpu.tools.viewer import main as viewer_main

    rng = np.random.default_rng(0)
    d = {
        "points": rng.uniform(-10, 10, (500, 4)).astype(np.float32),
        "gt_boxes": np.array(
            [[5.0, 0.0, -0.5, 3.9, 1.6, 1.5, 0.3, 1.0]], np.float32
        ),
        "frame_id": "x",
    }
    p = tmp_path / "frame.pkl"
    p.write_bytes(pickle.dumps(d))
    out = tmp_path / "v.html"
    assert viewer_main(
        [str(p), "--pcdet-dict", str(p), "--out", str(out)]
    ) == 0
    s = out.read_text()
    frames = _json.loads(
        re.search(r"const FRAMES = (\[.*?\]);\n", s, re.S).group(1)
    )
    assert frames[0]["n"] == 500
    assert len(frames[0]["boxes"]) == 1
    js = s[s.index("<script>"):]
    assert js.count("{") == js.count("}")
