"""Camera calibration / FOV filter tests (reference simulation.py:32-47)."""

import numpy as np
import pytest

from lidar_snow_sim_tpu.camera import (
    CameraCalibration,
    camera_fov_mask,
    get_fov_flag,
)


def test_kitti_calib_roundtrip(tmp_path):
    p2 = np.array([[700.0, 0, 600, 40], [0, 700, 180, 1], [0, 0, 1, 0.005]])
    r0 = np.eye(3)
    v2c = np.array(
        [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.5]], float
    )
    f = tmp_path / "calib.txt"
    f.write_text(
        "P2: " + " ".join(map(str, p2.ravel())) + "\n"
        "R0_rect: " + " ".join(map(str, r0.ravel())) + "\n"
        "Tr_velo_to_cam: " + " ".join(map(str, v2c.ravel())) + "\n"
    )
    calib = CameraCalibration.from_file(f)
    np.testing.assert_allclose(calib.P2, p2)
    np.testing.assert_allclose(calib.V2C, v2c)

    pts = np.array([[10.0, 0.0, 0.0], [10.0, 2.0, 1.0]], np.float32)
    rect = np.asarray(calib.lidar_to_rect(pts))
    # manual chain: R0 @ (V2C @ hom)
    hom = np.hstack([pts, np.ones((2, 1))])
    expect = (r0 @ (v2c @ hom.T)).T
    np.testing.assert_allclose(rect, expect, rtol=1e-5)

    img, depth = calib.rect_to_img(rect)
    img, depth = np.asarray(img), np.asarray(depth)
    proj = np.hstack([rect, np.ones((2, 1))]) @ p2.T
    # pcdet semantics: pixels divide by the RECT z (not proj z); depth is
    # proj_z - P2[2,3] == rect z. Distinguishable because P2[2,3] != 0 here.
    np.testing.assert_allclose(img, proj[:, :2] / rect[:, 2:3], rtol=1e-4)
    np.testing.assert_allclose(depth, rect[:, 2], rtol=1e-5)


def test_default_rig_is_shipped_data_file():
    """The default DENSE rig loads from data/calib_hdl64.txt through the
    same KITTI parser as user calibs, with the documented STF stereo-left
    intrinsics, and projects hand-computed pixels."""
    from lidar_snow_sim_tpu.camera import DEFAULT_CALIB_FILE

    assert DEFAULT_CALIB_FILE.exists()
    calib = CameraCalibration.default_dense_hdl64()
    assert calib.fu == calib.fv == pytest.approx(2355.722744)
    assert calib.cu == pytest.approx(988.138054)
    assert calib.cv == pytest.approx(508.051838)
    np.testing.assert_array_equal(calib.R0, np.eye(3))

    # a point straight ahead on the optical axis projects to the principal
    # point: lidar (d, 0, -0.4) + 1 m forward offset -> camera (0, 0, d+1)
    pts = np.array([[20.0, 0.0, -0.4]], np.float32)
    img, depth = calib.lidar_to_img(pts)
    img, depth = np.asarray(img), np.asarray(depth)
    np.testing.assert_allclose(img[0], [988.138054, 508.051838], atol=1e-2)
    np.testing.assert_allclose(depth[0], 21.0, rtol=1e-6)

    # hand-computed off-axis projection: lidar (20, 2, 0.6) ->
    # camera (x=-2, y=-1, z=21) -> u = cu - 2 fu / 21, v = cv - fv / 21
    pts = np.array([[20.0, 2.0, 0.6]], np.float32)
    img, _ = calib.lidar_to_img(pts)
    u = 988.138054 - 2 * 2355.722744 / 21.0
    v = 508.051838 - 2355.722744 / 21.0
    np.testing.assert_allclose(np.asarray(img)[0], [u, v], atol=1e-2)


def test_fov_flag_semantics():
    calib = CameraCalibration.default_dense_hdl64()
    # straight ahead: in FOV; behind the sensor: rejected
    pts = np.array(
        [[20.0, 0.0, 0.0], [-20.0, 0.0, 0.0], [20.0, 0.5, -0.3]], np.float32
    )
    flag = np.asarray(
        get_fov_flag(calib.lidar_to_rect(pts), (1024, 1920), calib)
    )
    assert flag[0] and flag[2]
    assert not flag[1]


def test_camera_fov_mask_forward_cone():
    rng = np.random.default_rng(0)
    ang = rng.uniform(-np.pi, np.pi, 5000)
    pts = np.column_stack(
        [30 * np.cos(ang), 30 * np.sin(ang), rng.uniform(-2, 2, 5000)]
    ).astype(np.float32)
    m = np.asarray(camera_fov_mask(pts))
    kept_ang = np.abs(np.degrees(ang[m]))
    # forward cone only: everything kept is well inside +/-45 deg (points can
    # additionally be dropped for vertical bounds at any azimuth)
    assert kept_ang.max() < 45.0
    assert 0.05 < m.mean() < 0.5
