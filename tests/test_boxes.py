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
