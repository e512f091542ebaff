"""Multi-format dataset loader tests (viewer surface, SURVEY.md §2.1)."""

import gzip
import pickle

import numpy as np
import pytest

from lidar_snow_sim_tpu.utils.datasets import (
    load_bin,
    load_npz,
    load_pkl,
    load_ply,
    load_pointcloud,
    normalize_pc,
)


@pytest.fixture
def xyz_i():
    rng = np.random.default_rng(0)
    return np.column_stack(
        [rng.normal(0, 20, (50, 3)), rng.uniform(0, 1, 50)]
    ).astype(np.float32)


def test_normalize_pads_and_scales(xyz_i):
    out = normalize_pc(xyz_i, intensity_scale=255.0)
    assert out.shape == (50, 5)
    assert out.dtype == np.float32
    assert out[:, 3].max() <= 255.0
    np.testing.assert_allclose(out[:, :3], xyz_i[:, :3])
    np.testing.assert_allclose(out[:, 4], 0.0)


def test_load_bin_4_and_5_col(tmp_path, xyz_i):
    p4 = tmp_path / "kitti.bin"
    xyz_i.astype(np.float32).tofile(p4)
    out = load_bin(p4, columns=4, intensity_scale=255.0)
    assert out.shape == (50, 5)

    five = np.column_stack([xyz_i[:, :3], xyz_i[:, 3] * 255,
                            np.arange(50, dtype=np.float32)]).astype(np.float32)
    p5 = tmp_path / "stf.bin"
    five.tofile(p5)
    out5 = load_bin(p5, columns=5)
    np.testing.assert_allclose(out5[:, 4], np.arange(50))


def test_load_pkl_plain_and_gz(tmp_path, xyz_i):
    p = tmp_path / "pc.pkl"
    with open(p, "wb") as f:
        pickle.dump(xyz_i, f)
    assert load_pkl(p).shape == (50, 5)
    pgz = tmp_path / "pc.pkl.gz"
    with gzip.open(pgz, "wb") as f:
        pickle.dump(xyz_i, f)
    np.testing.assert_allclose(load_pkl(pgz), load_pkl(p))


def _write_ply_ascii(path, rows):
    props = "\n".join(
        f"property float {n}" for n in ["x", "y", "z", "intensity"]
    )
    path.write_bytes(
        (
            f"ply\nformat ascii 1.0\nelement vertex {len(rows)}\n"
            f"{props}\nend_header\n"
            + "\n".join(" ".join(f"{v:.6f}" for v in r) for r in rows)
            + "\n"
        ).encode()
    )


def _write_ply_binary(path, rows):
    import struct

    props = "\n".join(
        f"property float {n}" for n in ["x", "y", "z", "intensity"]
    )
    header = (
        f"ply\nformat binary_little_endian 1.0\nelement vertex {len(rows)}\n"
        f"{props}\nend_header\n"
    ).encode()
    body = b"".join(struct.pack("<ffff", *r) for r in rows)
    path.write_bytes(header + body)


def test_load_ply_ascii_and_binary(tmp_path, xyz_i):
    pa = tmp_path / "a.ply"
    pb = tmp_path / "b.ply"
    _write_ply_ascii(pa, xyz_i)
    _write_ply_binary(pb, xyz_i)
    outa = load_ply(pa)
    outb = load_ply(pb)
    assert outa.shape == (50, 5)
    np.testing.assert_allclose(outa, outb, atol=1e-5)
    np.testing.assert_allclose(outa[:, :3], xyz_i[:, :3], atol=1e-5)


def test_load_npz_a2d2_style(tmp_path, xyz_i):
    p = tmp_path / "a2d2.npz"
    np.savez(
        p,
        points=xyz_i[:, :3],
        reflectance=xyz_i[:, 3] * 255,
        lidar_id=np.ones(50),
    )
    out = load_npz(p)
    assert out.shape == (50, 5)
    np.testing.assert_allclose(out[:, 4], 1.0)


def test_dispatch_by_dataset_and_extension(tmp_path, xyz_i):
    p = tmp_path / "scan.bin"
    xyz_i.astype(np.float32).tofile(p)
    out = load_pointcloud(p, dataset="KITTI")
    assert out.shape == (50, 5)
    with pytest.raises(ValueError):
        load_pointcloud(tmp_path / "x.xyz", dataset="unknown")


def test_result_pkl_roundtrip(tmp_path):
    """OpenPCDet result.pkl loader (load_results semantics: sorted by
    frame_id) + per-frame prediction arrays (visualize_predictions: the
    Car/Pedestrian/Cyclist 0-based lookup, frame mismatch raises)."""
    import pickle

    from lidar_snow_sim_tpu.utils.datasets import (
        load_result_pkl,
        result_predictions,
    )

    result = [
        {"frame_id": "b", "boxes_lidar": np.ones((2, 7), np.float32),
         "name": np.array(["Car", "Tram"]),
         "score": np.array([0.5, 0.25], np.float32)},
        {"frame_id": "a", "boxes_lidar": np.zeros((1, 7), np.float32),
         "name": np.array(["Pedestrian"]),
         "score": np.array([0.8], np.float32)},
    ]
    p = tmp_path / "result.pkl"
    p.write_bytes(pickle.dumps(result))
    loaded = load_result_pkl(p)
    assert [d["frame_id"] for d in loaded] == ["a", "b"]  # sorted

    arr = result_predictions(loaded, "b")
    assert arr.shape == (2, 9)
    assert arr[0, 7] == 0          # Car -> 0 (reference lookup)
    assert arr[1, 7] == 3          # unknown class -> past the table
    np.testing.assert_allclose(arr[:, 8], [0.5, 0.25])
    with pytest.raises(KeyError):
        result_predictions(loaded, "missing")


def test_pcdet_dict_loader(tmp_path):
    import pickle

    from lidar_snow_sim_tpu.utils.datasets import load_pcdet_dict

    d = {"points": np.ones((7, 4), np.float32),
         "gt_boxes": np.ones((2, 8), np.float32)}
    p = tmp_path / "f.pkl"
    p.write_bytes(pickle.dumps(d))
    pc, gt = load_pcdet_dict(p)
    assert pc.shape == (7, 5) and gt.shape == (2, 8)
    pc2, gt2 = load_pcdet_dict(tmp_path / "f.pkl")
    assert gt2.shape == (2, 8)
    # dict without gt_boxes -> empty boxes, not a crash
    p2 = tmp_path / "g.pkl"
    p2.write_bytes(pickle.dumps({"points": np.ones((3, 4), np.float32)}))
    _, gt3 = load_pcdet_dict(p2)
    assert gt3.shape == (0, 7)


def test_find_camera_image(tmp_path):
    from lidar_snow_sim_tpu.utils.datasets import find_camera_image

    lidar = tmp_path / "lidar_hdl64"
    cam = tmp_path / "cam_stereo_left_lut"
    lidar.mkdir()
    cam.mkdir()
    (cam / "2019-01-01_00001.png").write_bytes(b"png")
    assert find_camera_image(lidar / "2019-01-01_00001.bin") == (
        cam / "2019-01-01_00001.png"
    )
    assert find_camera_image(lidar / "2019-01-01_00002.bin") is None
