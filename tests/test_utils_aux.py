"""Tests for auxiliary utilities: STF meta, planes IO, render, empirical
distribution, fresnel extras (reference parity surfaces, SURVEY.md §2.1)."""

import json

import numpy as np
import pytest

from lidar_snow_sim_tpu.ops.fresnel import (
    bathymetric_scattering,
    lidar_measurement,
)
from lidar_snow_sim_tpu.sampling.empirical import (
    incidence_range_empirical_distribution,
)
from lidar_snow_sim_tpu.utils.planes_io import (
    save_plane,
    transform_results_to_camera_extrinsics,
    write_csv,
)
from lidar_snow_sim_tpu.utils.render import (
    augmentation_stat_labels,
    bev_image,
    cloud_log_string,
    normalized_hist2d,
)
from lidar_snow_sim_tpu.utils.stf_meta import (
    filter_daytime,
    filter_env,
    filter_infra,
    filter_weather,
    read_meta_label,
    read_road_wetness,
    select_frames,
)


META = {
    "weather": {"clear": True, "snow": False},
    "daytime": {"day": True, "night": False},
    "meta": {
        "environment": {"urban": True, "highway": False},
        "infrastructure": {"tunnel": False},
    },
}


def test_meta_filters(tmp_path):
    p = tmp_path / "frame.json"
    p.write_text(json.dumps(META))
    meta = read_meta_label(p)
    assert filter_weather(meta, "clear") and not filter_weather(meta, "snow")
    assert filter_env(meta, "urban") and not filter_env(meta, "highway")
    assert filter_daytime(meta, "day")
    assert not filter_infra(meta, "tunnel")


def test_select_frames(tmp_path):
    for i, clear in enumerate([True, False, True]):
        m = json.loads(json.dumps(META))
        m["weather"]["clear"] = clear
        (tmp_path / f"f{i}.json").write_text(json.dumps(m))
    ids = select_frames(tmp_path, ["f0", "f1", "f2", "missing"],
                        weather="clear")
    assert ids == ["f0", "f2"]


def test_road_wetness(tmp_path):
    p = tmp_path / "wet.json"
    p.write_text(json.dumps(
        {"water_thickness": 0.4, "surface_state_result": "wet"}
    ))
    assert read_road_wetness(p) == (0.4, "wet")
    assert read_road_wetness(tmp_path / "nope.json") is None
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert read_road_wetness(bad) is None


def test_plane_transform_and_save(tmp_path):
    # identity projection: normal unchanged, h_projected = w . (0,0,h)
    w, hp = transform_results_to_camera_extrinsics(
        np.eye(4), [0.0, 0.0, 1.0], -1.55
    )
    np.testing.assert_allclose(w, [0, 0, 1])
    assert abs(hp - (-1.55)) < 1e-12
    save_plane(tmp_path, "plane.txt", [0, 0, 1], -1.55, np.eye(4))
    lines = (tmp_path / "plane.txt").read_text().splitlines()
    assert lines[0] == "# Plane"
    vals = [float(v) for v in lines[3].split()]
    np.testing.assert_allclose(vals, [0, 0, 1, -1.55], atol=1e-12)


def test_write_csv(tmp_path):
    write_csv("t", [1, 2], [3.5, 4.5], label_file="lbl",
              folder=str(tmp_path / "stats"))
    content = (tmp_path / "stats" / "lbl_t.csv").read_text().splitlines()
    assert content[0].startswith("x_data")
    assert content[1].split(",") == ["1", "3.5"]


def test_bev_image_and_stats():
    pc = np.array(
        [[10.0, 0.0, 0.0, 100, 0], [20.0, 5.0, 0.0, 50, 1],
         [-30.0, -5.0, 0.0, 200, 2]],
        np.float32,
    )
    for color in ("depth", "intensity", "label", "channel", "height"):
        img = bev_image(pc, color=color, resolution=2)
        assert img.shape == (2 * 2 * 15, 2 * 2 * 80, 3)
        assert img.sum() > 0  # points landed in bounds
    assert "3 points" in cloud_log_string(pc)
    labels = augmentation_stat_labels(pc, n_before=5)
    assert labels == {
        "num_unchanged": 1, "num_attenuated": 1, "num_scattered": 1,
        "num_removed": 2,
    }


def test_normalized_hist2d_columns():
    rng = np.random.default_rng(0)
    h, xe, ye = normalized_hist2d(
        rng.uniform(0, 1, 1000), rng.uniform(0, 1, 1000), 10, 10
    )
    sums = h.sum(axis=0)
    np.testing.assert_allclose(sums[sums > 0], 10.0, rtol=1e-6)


def test_incidence_range_distribution():
    # one particle dead ahead on the +x axis at 10 m, radius 1 m
    samples = np.array([[10.0, 0.0, 1.0]])
    ranges, dirs = incidence_range_empirical_distribution(
        samples, R_0=80.0, n_directions=8
    )
    assert dirs[0] == 0.0
    assert abs(ranges[0] - 9.0) < 1e-9      # entry point of the disk
    np.testing.assert_allclose(ranges[1:], 80.0)  # all other rays miss
    # empty field: every ray travels R_0
    r2, _ = incidence_range_empirical_distribution(
        np.zeros((0, 3)), 50.0, 4
    )
    np.testing.assert_allclose(r2, 50.0)


def test_stage_profiler():
    import time

    from lidar_snow_sim_tpu.utils.profiling import StageProfiler

    p = StageProfiler()
    with p.stage("load"):
        time.sleep(0.01)
    with p.stage("load"):
        time.sleep(0.01)
    p.count("scans", 4)
    r = p.report()
    assert r["stages"]["load"]["calls"] == 2
    assert r["stages"]["load"]["s"] >= 0.02
    assert r["counters"]["scans"] == 4
    assert p.rate("scans") > 0
    assert p.rate("scans", per_stage="load") > p.rate("scans")


def test_top_level_lazy_exports():
    import lidar_snow_sim_tpu as pkg

    assert callable(pkg.augment)
    assert callable(pkg.ground_water_augmentation)
    assert callable(pkg.dynamic_radius_outlier_filter)
    with pytest.raises(AttributeError):
        pkg.not_a_symbol


def test_fresnel_extras():
    r = np.asarray(bathymetric_scattering(np.array([0.0, 0.5, 1.0])))
    assert (np.diff(r) < 0).all()  # falls off with incidence angle
    assert r[0] <= 1.0
    i = np.asarray(lidar_measurement(np.array([0.0, 10.0, 80.0])))
    assert (np.diff(i) < 0).all()  # farther -> dimmer under flat earth
