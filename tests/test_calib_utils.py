import numpy as np

from lidar_snow_sim_tpu.calib import load_hdl64_calib
from lidar_snow_sim_tpu.utils import pad_cloud, compact_cloud
from lidar_snow_sim_tpu.utils.splits import reorder_second_half_first
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan


def test_calib_lut_shapes_and_semantics():
    c = load_hdl64_calib()
    assert c.num_lasers == 64
    # lasers 34..63 have no min_intensity in the factory file -> 0
    assert np.all(c.min_intensity[34:] == 0)
    assert np.all(c.min_intensity[:34] > 0)
    # focal_distance stored pre-scaled by 100 (simulation.py:74)
    assert c.focal_distance[0] == np.float32(8.0 * 100)
    # focal_offset = (1 - fd/13100)^2 (simulation.py:76)
    np.testing.assert_allclose(
        c.focal_offset, (1 - c.focal_distance / 13100) ** 2, rtol=1e-6
    )
    # channels {53,55,56,58} cap at 230 (simulation.py:123-126)
    assert all(c.max_intensity[ch] == 230 for ch in (53, 55, 56, 58))
    assert c.max_intensity[54] == 255


def test_pad_and_compact_roundtrip():
    pc = synthetic_scan(n_azimuth=64)
    padded = pad_cloud(pc, 1 << int(np.ceil(np.log2(len(pc)))))
    assert padded.mask.sum() == len(pc)
    back = compact_cloud(padded.points, padded.mask)
    np.testing.assert_array_equal(back, pc)


def test_split_reorder():
    ids = list("abcdefg")  # odd length: first half is 4 long
    out = reorder_second_half_first(ids)
    assert out == ["e", "f", "g", "d", "c", "b", "a"]
    assert sorted(out) == sorted(ids)


def test_synthetic_scan_contract():
    pc = synthetic_scan(n_azimuth=128)
    assert pc.shape[1] == 5 and pc.dtype == np.float32
    assert pc[:, 3].min() >= 0 and pc[:, 3].max() <= 255
    ch = pc[:, 4]
    assert ch.min() >= 0 and ch.max() <= 63
    assert len(np.unique(ch)) > 40  # most channels populated
    # plenty of ground points near z = -1.55 for the plane fit
    near_ground = np.abs(pc[:, 2] + 1.55) < 0.2
    assert near_ground.sum() > 1000
