"""Box utilities tests (viewer GT/prediction surface)."""

import numpy as np

from lidar_snow_sim_tpu.utils.boxes import (
    Box3D,
    draw_boxes_bev,
    parse_kitti_label_line,
    points_in_boxes,
    read_label_file,
)
from lidar_snow_sim_tpu.utils.render import bev_image


def test_corners_and_contains():
    b = Box3D(x=10, y=0, z=0, length=4, width=2, height=1.5, yaw=np.pi / 2)
    c = b.corners()
    assert c.shape == (8, 3)
    # yaw 90 deg: length now along y
    assert np.ptp(c[:, 1]) > np.ptp(c[:, 0])
    pts = np.array([[10.0, 0.0, 0.0], [10.0, 1.9, 0.0], [10.0, 2.5, 0.0],
                    [11.5, 0.0, 0.0]])
    inside = b.contains(pts)
    assert inside.tolist() == [True, True, False, False]


def test_parse_and_read(tmp_path):
    line = ("PassengerCar 0 0 0 0 0 50 50 1.5 1.8 4.2 12.0 -3.0 -1.6 0.3")
    b = parse_kitti_label_line(line)
    assert b.identity == "PassengerCar"
    assert b.length == 4.2 and b.width == 1.8 and b.height == 1.5
    assert abs(b.z - (-1.6 + 0.75)) < 1e-9  # bottom + h/2

    f = tmp_path / "frame.txt"
    f.write_text(line + "\nDontCare 0 0 0 0 0 1 1 1 1 1 0 0 0 0\nbad line\n")
    boxes = read_label_file(f)
    assert len(boxes) == 1  # DontCare filtered, bad line skipped
    assert len(read_label_file(f, classes=None)) == 2
    assert read_label_file(tmp_path / "missing.txt") == []


def test_points_in_boxes_first_wins():
    b1 = Box3D(5, 0, 0, 2, 2, 2, 0.0, identity="PassengerCar")
    b2 = Box3D(5.5, 0, 0, 2, 2, 2, 0.0, identity="Pedestrian")
    pts = np.array([[5.0, 0, 0], [6.3, 0, 0], [20.0, 0, 0]])
    idx = points_in_boxes(pts, [b1, b2])
    assert idx.tolist() == [0, 1, -1]


def test_draw_boxes_bev():
    img = bev_image(np.zeros((0, 5), np.float32), resolution=4)
    before = img.sum()
    draw_boxes_bev(
        img, [Box3D(10, 0, 0, 4, 2, 1.5, 0.4, identity="PassengerCar")],
        resolution=4,
    )
    assert img.sum() > before


def test_stf_label_surface(tmp_path):
    """STF devkit surface parity (`pointcloud_viewer.py:3067-3120`):
    load_calib_data composes camera_to_velodyne from the TF-tree JSON and
    read_label transforms camera-frame rows to LiDAR-frame annotations."""
    import json

    import numpy as np

    from lidar_snow_sim_tpu.utils.stf_labels import (
        dense_boxes,
        load_calib_data,
        read_label,
    )

    # TF tree: lidar sits 1 m behind / 0.4 m above the camera mount; the
    # camera optical frame is the KITTI axis permutation of the mount.
    tf_tree = [
        {
            "header": {"frame_id": "base"},
            "child_frame_id": "lidar_hdl64_s3_roof",
            "transform": {
                "translation": {"x": 0.0, "y": 0.0, "z": 1.9},
                "rotation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
            },
        },
        {
            "header": {"frame_id": "base"},
            "child_frame_id": "cam_mount",
            "transform": {
                "translation": {"x": 1.0, "y": 0.0, "z": 1.5},
                "rotation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
            },
        },
        {
            "header": {"frame_id": "cam_mount"},
            "child_frame_id": "cam_stereo_left_optical",
            "transform": {
                "translation": {"x": 0.0, "y": 0.0, "z": 0.0},
                # x-forward/z-up -> z-forward/y-down: quaternion for
                # Rz(-90deg) then Rx(-90deg): (x,y,z,w) = (.5,-.5,.5,-.5)
                "rotation": {"x": 0.5, "y": -0.5, "z": 0.5, "w": -0.5},
            },
        },
    ]
    (tmp_path / "calib_tf_tree_full.json").write_text(json.dumps(tf_tree))
    (tmp_path / "calib_cam_stereo_left.json").write_text(json.dumps({
        "frame_id": "cam_stereo_left_optical",
        "P": [2355.0, 0, 988.0, 0, 0, 2355.0, 508.0, 0, 0, 0, 1.0, 0],
    }))

    calib = load_calib_data(
        tmp_path, "calib_cam_stereo_left.json", "calib_tf_tree_full.json",
        velodyne_name="lidar_hdl64_s3_roof",
    )
    v2c, c2v = calib[0], calib[1]
    # a point 10 m ahead of the lidar: the camera mount is 1 m ahead and
    # 0.4 m below it, so the optical frame sees z = 9 forward and
    # y = -0.4 (the point sits ABOVE the camera; +y is down)
    p_cam = v2c @ np.array([10.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(p_cam[:3], [0.0, -0.4, 9.0], atol=1e-6)
    np.testing.assert_allclose(c2v @ p_cam, [10, 0, 0, 1], atol=1e-6)

    # camera-frame label at that camera position, 90-deg KITTI yaw
    labels = tmp_path / "gt_labels"
    labels.mkdir()
    (labels / "frame_000.txt").write_text(
        "PassengerCar 0 0 0 0 0 100 100 1.5 1.8 4.0 0.0 -0.4 9.0 "
        f"{-np.pi / 2} 0.9\n"
        "DontCare 0 0 0 0 0 10 10 1 1 1 0 0 5 0\n"
    )
    anns = read_label(labels / "frame_000", labels, camera_to_velodyne=c2v)
    assert len(anns) == 2
    car = anns[0]
    assert car["identity"] == "PassengerCar"
    np.testing.assert_allclose(
        [car["posx_lidar"], car["posy_lidar"], car["posz_lidar"]],
        [10.0, 0.0, 0.0], atol=1e-6,
    )
    assert abs(car["rotz"]) < 1e-9     # -(-pi/2) - pi/2 == 0: x-aligned
    assert (car["length"], car["width"], car["height"]) == (4.0, 1.8, 1.5)

    boxes = dense_boxes(labels / "frame_000", labels, camera_to_velodyne=c2v)
    assert len(boxes) == 1             # DontCare filtered by identity
    assert boxes[0].contains(np.array([[10.0, 0.0, 0.7, 0, 0]])).all()
    assert not boxes[0].contains(np.array([[13.0, 0.0, 0.7, 0, 0]])).any()
