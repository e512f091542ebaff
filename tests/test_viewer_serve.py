"""Live viewer serve loop (tools/serve.py) — the Qt viewer's interactive
surface: parameter changes re-augment without a process restart
(`snowfall_change`, /root/reference/pointcloud_viewer.py:1635) and the
inference button runs the detector on the currently displayed, augmented
cloud (`run_inference`, :2388-2436)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from lidar_snow_sim_tpu.sampling.distributions import (
    compute_occupancy,
    snowfall_rate_to_rainfall_rate,
)

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

SNOW_RATE, SNOW_VEL = 0.5, 2.0


@pytest.fixture(scope="module")
def server(tmp_path_factory, calib, small_particle_sets):
    from lidar_snow_sim_tpu.tools.serve import make_server
    from lidar_snow_sim_tpu.tools.viewer import build_parser
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    root = tmp_path_factory.mktemp("serve")
    pc = synthetic_scan(n_azimuth=120, seed=0, calib=calib)
    scan = root / "2019-01-01_00007.bin"
    pc.astype(np.float32).tofile(scan)

    # bank files under the live prefix the pipeline computes from the
    # sliders (the viewer's f'{mode}_{rain_rate}_{occupancy}' convention,
    # pointcloud_viewer.py:2798-2802)
    banks = root / "snowflakes"
    banks.mkdir()
    rr = snowfall_rate_to_rainfall_rate(SNOW_RATE, SNOW_VEL)
    occ = compute_occupancy(SNOW_RATE, SNOW_VEL)
    for i, s in enumerate(small_particle_sets):
        np.save(banks / f"gunn_{rr}_{occ}_{i + 1}.npy", s)

    yaml_path = root / "pointpillar.yaml"
    yaml_path.write_text(TINY_YAML)

    ap = build_parser()
    args = ap.parse_args([
        str(scan), "--serve", "--host", "127.0.0.1", "--port", "0",
        "--bank-dir", str(banks), "--rate", str(SNOW_RATE),
        "--velocity", str(SNOW_VEL), "--config", str(yaml_path),
        "--random-params", "--max-points", "5000",
    ])
    srv = make_server(args, ap)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}"
    srv.shutdown()
    srv.server_close()
    t.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, r.read().decode()


def _post(url, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_page_has_live_controls(server):
    status, page = _get(server + "/")
    assert status == 200
    for needle in ('id="aug"', 'id="rate"', 'id="inferbtn"', "reaugment",
                   "/augment", "/infer", "const FRAMES"):
        assert needle in page, needle
    # brace-balanced script (format-template + literal serve JS compose)
    js = page[page.index("<script>"):]
    assert js.count("{") == js.count("}")


def test_augment_endpoint_reaugments_without_restart(server):
    # fog at two different alphas: the frame payload changes, no restart
    s1, j1 = _post(server + "/augment", {"augment": "fog",
                                         "fog_alpha": 0.01})
    s2, j2 = _post(server + "/augment", {"augment": "fog",
                                         "fog_alpha": 0.1})
    assert s1 == s2 == 200
    for j in (j1, j2):
        assert j["frame"]["n"] > 0
        assert set(j["frame"]["colors"]) == {
            "label", "intensity", "height", "channel", "depth"
        }
        assert "fog" in j["stats"]
    # heavier fog scatters more points — the payload really re-augmented
    assert (j2["stats"]["fog"]["num_scattered"]
            > j1["stats"]["fog"]["num_scattered"])
    # repeated params are served from the result cache bit-identically
    s3, j3 = _post(server + "/augment", {"augment": "fog",
                                         "fog_alpha": 0.1})
    assert s3 == 200 and j3 == j2


def test_augment_endpoint_snow_chain(server):
    status, j = _post(server + "/augment", {
        "augment": "snow", "rate": SNOW_RATE, "velocity": SNOW_VEL,
        "mode": "gunn",
    })
    assert status == 200
    snow = j["stats"]["snow"]
    assert snow["num_removed"] >= 0 and snow["num_attenuated"] >= 0
    assert j["frame"]["n"] > 0
    # labels plane reflects the augmentation outcome (0/1/2 contract)
    import base64

    lab = np.frombuffer(base64.b64decode(j["frame"]["colors"]["label"]),
                        np.uint8)
    assert set(np.unique(lab)) <= {0, 1, 2}


def test_augment_endpoint_validates(server):
    status, j = _post(server + "/augment", {"augment": "blizzard"})
    assert status == 400 and "augment" in j["error"]
    status, j = _post(server + "/augment", {"bogus": 1})
    assert status == 400 and "bogus" in j["error"]


def test_infer_runs_on_displayed_cloud(server):
    # inference on the fog-augmented cloud — the reference's run_inference
    # consumes self.current_pc (augmentations applied), not the raw scan
    status, j = _post(server + "/infer", {"augment": "fog",
                                          "fog_alpha": 0.01})
    assert status == 200
    inf = j["stats"]["inference"]
    assert inf["input_points"] > 0
    assert inf["num_predictions"] == len(j["boxes"])
    for b in j["boxes"]:
        assert len(b["c"]) == 8 and b["s"] >= 0  # score-thresholdable
    # a second call on a DIFFERENT cloud size reuses the padded engine
    status2, j2 = _post(server + "/infer", {"augment": "none"})
    assert status2 == 200
    assert j2["stats"]["inference"]["input_points"] >= inf["input_points"]
